"""Model construction (reference ``slowfast/models/build.py``).

On TPU there is no ``.cuda()``/DDP wrap: ``build_model`` returns the linen
module plus its static arch; parameter init/sharding happens in the engine
where the mesh lives.
"""

from __future__ import annotations

import jax.numpy as jnp

from svit_tpu.models.registry import MODEL_REGISTRY
from svit_tpu.models.svit import SViT, SViTArch

MODEL_REGISTRY.register("SViT")(SViT)

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def compute_dtype(cfg):
    if cfg.TRAIN.MIXED_PRECISION:
        return _DTYPES[cfg.TPU.COMPUTE_DTYPE]
    return jnp.float32


def _tpu_backend() -> bool:
    import jax

    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def build_model(cfg, dtype=None, use_pallas=None):
    """Return (module, arch) for cfg.MODEL.MODEL_NAME."""
    name = cfg.MODEL.MODEL_NAME
    model_cls = MODEL_REGISTRY.get(name)
    arch = SViTArch.from_cfg(cfg)
    if dtype is None:
        dtype = compute_dtype(cfg)
    if use_pallas is None:
        use_pallas = bool(cfg.TPU.USE_PALLAS_ATTENTION) and _tpu_backend()
    return model_cls(arch=arch, dtype=dtype, use_pallas=use_pallas), arch
