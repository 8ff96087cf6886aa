from svit_tpu.models.build import build_model, compute_dtype  # noqa: F401
from svit_tpu.models.registry import MODEL_REGISTRY  # noqa: F401
from svit_tpu.models.svit import SViT, SViTArch, SViTHead  # noqa: F401
