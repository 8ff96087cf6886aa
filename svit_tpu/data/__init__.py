from svit_tpu.models.registry import DATASET_REGISTRY  # noqa: F401

# Importing registers the datasets.
from svit_tpu.data.ssv2 import Ssv2  # noqa: F401
from svit_tpu.data.ssv2_frames import Ssv2_frames  # noqa: F401
from svit_tpu.data.doh_frames import Doh_frames  # noqa: F401
from svit_tpu.data.multi_images import Multi_images  # noqa: F401
from svit_tpu.data.kinetics import Kinetics  # noqa: F401
from svit_tpu.data.build import build_dataset  # noqa: F401
from svit_tpu.data.loader import construct_loader, shuffle_dataset  # noqa: F401
