"""Misc utilities (mega_core/utils/{miscellaneous,collect_env,imports,
model_zoo,dist_env}.py parity).

cache_url is a stub in this zero-egress environment: catalog:// and http(s)
weights must be pre-placed on disk; the resolver maps catalog names to local
paths under MODEL_DIR.
"""

from __future__ import annotations

import importlib.util
import json
import os


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def save_labels(label_list, output_dir: str) -> None:
    """labels.json class map (miscellaneous.py:17-33)."""
    mkdir(output_dir)
    ids_to_labels = {i: name for i, name in enumerate(label_list)}
    with open(os.path.join(output_dir, "labels.json"), "w") as f:
        json.dump(ids_to_labels, f, indent=2)


def save_config(cfg, path: str) -> None:
    mkdir(os.path.dirname(path) or ".")
    with open(path, "w") as f:
        f.write(cfg.dump())


def collect_env_info() -> str:
    """Environment dump for the startup log (collect_env.py analog)."""
    import platform

    import jax

    lines = [
        f"python: {platform.python_version()}",
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {jax.devices()}",
        f"process: {jax.process_index()}/{jax.process_count()}",
    ]
    return "\n".join(lines)


def import_file(module_name: str, file_path: str):
    """Exec a python file as a module (imports.py — used for user catalogs)."""
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


MODEL_DIR = os.environ.get("MEGA_TPU_MODEL_DIR", "models")

# catalog:// name → expected local file under MODEL_DIR (the reference's
# ModelCatalog resolves these to S3 URLs, config/paths_catalog.py:234-292;
# zero-egress here, so users pre-download)
MODEL_CATALOG = {
    "ImageNetPretrained/MSRA/R-50": "R-50.pkl",
    "ImageNetPretrained/MSRA/R-101": "R-101.pkl",
    "ImageNetPretrained/MSRA/R-152": "R-152.pkl",
}


def resolve_weight(uri: str) -> str:
    """catalog://X → local path; http(s) unsupported offline; else passthrough."""
    if uri.startswith("catalog://"):
        name = uri[len("catalog://"):]
        if name not in MODEL_CATALOG:
            raise KeyError(f"unknown catalog entry {name}")
        return os.path.join(MODEL_DIR, MODEL_CATALOG[name])
    if uri.startswith("http"):
        raise RuntimeError(
            f"zero-egress environment cannot fetch {uri}; place the file under "
            f"{MODEL_DIR}/ and point MODEL.WEIGHT at it"
        )
    return uri


def init_distributed() -> None:
    """Multi-host initialization (utils/dist_env.py analog): jax.distributed
    reads the cluster env (Cloud TPU metadata / coordinator vars) directly —
    no NCCL/MPI rendezvous plumbing."""
    import jax

    if jax.process_count() > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def host_cache_namespace() -> str:
    """Short fingerprint of this host's CPU features.

    XLA:CPU persistent-cache entries are AOT machine code keyed WITHOUT the
    target CPU features; loading an entry compiled on a different machine
    warns 'could lead to execution errors such as SIGILL' and has produced
    real SIGABRTs here. Scoping the cache dir per CPU fingerprint makes
    cross-machine reuse impossible while keeping same-host reuse."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    key = platform.machine() + ":" + flags
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable jax's persistent compilation cache (idempotent).

    The streaming/train graphs take minutes to compile cold; every CLI calls
    this so repeat invocations start in seconds. Honors
    JAX_COMPILATION_CACHE_DIR (treated as the base dir); defaults to
    ~/.cache/mega_pytorch_tpu. The actual dir is namespaced per host CPU
    (see host_cache_namespace)."""
    import jax

    base = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/mega_pytorch_tpu/jax_cache")
    )
    cache_dir = os.path.join(base, host_cache_namespace())
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # unknown flags on an older jax: cache is best-effort


def jit_init(module, *args, **static_kwargs):
    """``module.init(*args, **static_kwargs)`` as one jitted XLA program.

    Eager flax init dispatches the whole traced forward op-by-op — thousands
    of host round-trips (30 ms each through the TPU relay) or of CPU dispatch
    overheads. One jitted program runs ~3x faster cold and is served by the
    persistent compilation cache warm. Non-array kwargs (``train=``,
    ``method=``) are static and closed over; positional args stay traced."""
    import jax

    return jax.jit(lambda a: module.init(*a, **static_kwargs))(args)


def honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS`` effective under sitecustomize-registered
    backends that override it via ``jax.config`` (the axon TPU relay plugin
    sets ``jax_platforms="axon,cpu"`` at import time, which silently wins
    over the env var). The CLI tools call this first, so
    ``JAX_PLATFORMS=cpu tools/demo.py …`` really runs on CPU — without it,
    backend init blocks forever on a dead relay tunnel."""
    import os

    v = os.environ.get("JAX_PLATFORMS")
    if v:
        import jax

        try:
            jax.config.update("jax_platforms", v)
        except Exception:
            pass  # unknown platform string: keep the default resolution
