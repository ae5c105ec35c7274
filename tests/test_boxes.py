import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.structures import (
    Boxes,
    area,
    box_iou,
    cat_boxes,
    clip_to_image,
    hflip_boxes,
    small_box_mask,
    xywh_to_xyxy,
    xyxy_to_xywh,
)


def test_area_plus_one_convention():
    b = jnp.array([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 5.0, 5.0]])
    np.testing.assert_allclose(area(b), [100.0, 1.0])


def test_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[0.0, 0.0, 9.0, 9.0], [100.0, 100.0, 109.0, 109.0], [5.0, 0.0, 14.0, 9.0]])
    iou = box_iou(a, b)
    assert iou.shape == (1, 3)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 0.0)
    # overlap: inter = 5x10 = 50 (+1 conv: (9-5+1)*(9-0+1)=50), union 150
    np.testing.assert_allclose(iou[0, 2], 50.0 / 150.0, rtol=1e-6)


def test_clip_and_small_mask():
    b = jnp.array([[-5.0, -5.0, 200.0, 50.0], [0.0, 0.0, 0.5, 0.5]])
    c = clip_to_image(b, height=100, width=150)
    np.testing.assert_allclose(c[0], [0.0, 0.0, 149.0, 50.0])
    mask = small_box_mask(c, min_size=2)
    assert bool(mask[0]) and not bool(mask[1])


def test_hflip_involution():
    b = jnp.array([[10.0, 5.0, 30.0, 25.0]])
    w = 100
    f = hflip_boxes(b, w)
    np.testing.assert_allclose(f, [[100 - 30 - 1, 5.0, 100 - 10 - 1, 25.0]])
    np.testing.assert_allclose(hflip_boxes(f, w), b)


def test_xywh_roundtrip():
    b = jnp.array([[10.0, 5.0, 30.0, 25.0]])
    np.testing.assert_allclose(xywh_to_xyxy(xyxy_to_xywh(b)), b)


def test_boxes_struct_fields_and_take():
    bx = Boxes(
        boxes=jnp.arange(20.0).reshape(5, 4),
        valid=jnp.array([1, 1, 1, 0, 0], bool),
        fields={"scores": jnp.arange(5.0)},
    )
    bx = bx.add_field("labels", jnp.arange(5))
    sub = bx.take(jnp.array([4, 2, 0]))
    assert sub.boxes.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(sub.valid), [False, True, True])
    np.testing.assert_allclose(sub.fields["scores"], [4.0, 2.0, 0.0])

    both = cat_boxes([bx, sub])
    assert both.num_boxes == 8
    assert set(both.fields) == {"scores", "labels"}
