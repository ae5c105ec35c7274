"""FGFA meta-architecture (Flow-Guided Feature Aggregation).

Parity with mega_core/modeling/detector/generalized_rcnn_fgfa.py:19-219:
  train — backbone on cur + refs; flow cur→ref per ref; refs warped to cur;
  EmbedNet on [cur feats; warped refs]; per-pixel cosine weights vs the cur
  embedding, softmaxed over frames; features = Σ weights · warped refs.

  test — a 19-slot window of [C4 feats ; embeddings] (embeddings computed on
  UNWARPED features when a frame enters, :146-160); every step warps ALL
  cached maps to the key frame, recomputes cosine weights against the key's
  warped embedding, and aggregates (:200-214).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import warp_by_flow
from ...structures.image_list import ImageBatch
from ..backbone.flownet import EmbedNet
from ..roi_heads.inference import Detections
from .dff import GeneralizedRCNNDFF
from .rcnn import RCNNConfig
from .rdn import VidConfig, _push


class FGFACarry(NamedTuple):
    images: jnp.ndarray  # (T, H, W, 3) normalized frames
    features: jnp.ndarray  # (T, h, w, 1024 + 2048) [feats ; embeds]
    sizes: jnp.ndarray  # (T, 2)


def cosine_weights(embed_refs: jnp.ndarray, embed_cur: jnp.ndarray) -> jnp.ndarray:
    """compute_weight (:64-75): per-pixel cosine similarity, (T, h, w, 1)."""
    norm_r = jnp.linalg.norm(embed_refs, axis=-1, keepdims=True) + 1e-10
    norm_c = jnp.linalg.norm(embed_cur, axis=-1, keepdims=True) + 1e-10
    sim = jnp.sum(embed_refs * embed_cur, axis=-1, keepdims=True)
    return sim / (norm_r * norm_c)


class GeneralizedRCNNFGFA(GeneralizedRCNNDFF):
    """Shares the detection heads with DFF; replaces feature aggregation."""

    c: RCNNConfig
    v: VidConfig

    def setup(self):
        super().setup()
        self.embednet = EmbedNet(
            dtype=jnp.dtype(self.c.compute_dtype), name="embednet"
        )

    def flow(self, img_cur: jnp.ndarray, img_ref: jnp.ndarray) -> jnp.ndarray:
        pair = jnp.concatenate([img_cur / 255.0, img_ref / 255.0], axis=-1)
        return self.flownet(pair).astype(jnp.float32)

    # -- train ----------------------------------------------------------------
    def forward_train(self, images: ImageBatch, gt: dict, rng: jax.Array):
        """images: (1 + num_refs) frames, cur first."""
        dtype = jnp.dtype(self.c.compute_dtype)
        feats = self.backbone(images.tensors.astype(dtype)).astype(jnp.float32)
        num_refs = images.tensors.shape[0] - 1
        img_cur = images.tensors[0:1]
        imgs_ref = images.tensors[1:]

        flow = self.flow(jnp.tile(img_cur, (num_refs, 1, 1, 1)), imgs_ref)
        warped_refs = jax.vmap(warp_by_flow)(feats[1:], flow)

        stacked = jnp.concatenate([feats[0:1], warped_refs], axis=0)
        embeds = self.embednet(stacked.astype(dtype)).astype(jnp.float32)
        weights = jax.nn.softmax(
            cosine_weights(embeds[1:], embeds[0:1]), axis=0
        )
        agg = jnp.sum(weights * warped_refs, axis=0, keepdims=True)
        return self._detect_heads_train(agg, images.sizes[0:1], gt, rng)

    # -- streaming test ----------------------------------------------------------
    def precompute(self, images: ImageBatch):
        """One frame → (image, [feats ; embeds]) cache entry (:146-160)."""
        dtype = jnp.dtype(self.c.compute_dtype)
        feats = self.backbone(images.tensors.astype(dtype)).astype(jnp.float32)
        embeds = self.embednet(feats.astype(dtype)).astype(jnp.float32)
        return images.tensors[0], jnp.concatenate([feats[0], embeds[0]], axis=-1)

    def init_carry(self, entry, size) -> FGFACarry:
        t = self.v.all_frame_interval
        img, fe = entry
        tile = lambda a: jnp.tile(a[None], (t,) + (1,) * a.ndim)  # noqa: E731
        return FGFACarry(images=tile(img), features=tile(fe), sizes=tile(size))

    def push_carry(self, carry: FGFACarry, entry, size) -> FGFACarry:
        img, fe = entry
        return FGFACarry(
            images=_push(carry.images, img),
            features=_push(carry.features, fe),
            sizes=_push(carry.sizes, size),
        )

    def detect_key(self, carry: FGFACarry) -> Detections:
        t = self.v.all_frame_interval
        k = self.v.key_frame_location
        cur_img = carry.images[k][None]

        flow = self.flow(jnp.tile(cur_img, (t, 1, 1, 1)), carry.images)
        warped = jax.vmap(warp_by_flow)(carry.features, flow)
        warped_feats = warped[..., :1024]
        embeds = warped[..., 1024:]
        weights = jax.nn.softmax(
            cosine_weights(embeds, embeds[k][None]), axis=0
        )
        agg = jnp.sum(weights * warped_feats, axis=0, keepdims=True)
        return self._detect_heads_test(agg, carry.sizes[k][None])

    def test_step(self, carry: FGFACarry, images: ImageBatch):
        entry = self.precompute(images)
        carry = self.push_carry(carry, entry, images.sizes[0])
        return carry, self.detect_key(carry)
