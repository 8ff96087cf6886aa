"""Test config: force CPU JAX with a virtual 8-device mesh.

The TPU analogue of the reference's "fake distributed" gap (it has none; see
SURVEY.md §4): all sharding logic is exercised on
``--xla_force_host_platform_device_count=8`` CPU devices.
"""

import os
import sys

# Must run before jax is imported anywhere.  Force CPU even if the
# environment pins a TPU platform — tests verify numerics in f32.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This environment's jaxlib pins platforms to the TPU tunnel regardless of
# JAX_PLATFORMS; the config knob still wins.
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFSHIM = os.path.join(REPO, "tests", "refshim")
REFERENCE = "/root/reference"

if REPO not in sys.path:
    sys.path.insert(0, REPO)

import pytest  # noqa: E402


def _reference_available():
    return os.path.isdir(os.path.join(REFERENCE, "slowfast"))


@pytest.fixture()
def torch_reference():
    """Import the PyTorch reference (via dependency shims) for golden tests.

    Function-scoped with teardown: the refshim dir must not stay on
    ``sys.path`` (and its ``cv2``/``av`` stubs must not stay importable)
    once the test is over — production code paths (demo webcam/writer)
    probe those modules and must see the REAL environment, where they are
    absent.  The heavyweight ``slowfast`` imports are still one-time:
    ``sys.modules`` caches them across fixture uses."""
    if not _reference_available():
        pytest.skip("reference repo not available")
    for p in (REFSHIM, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    import slowfast.models.video_model_builder as ref_builder  # noqa
    import slowfast.config.defaults as ref_defaults  # noqa

    yield ref_builder, ref_defaults

    for p in (REFSHIM, REFERENCE):
        while p in sys.path:
            sys.path.remove(p)
    # drop refshim-originated stubs of modules that PRODUCTION code imports
    # (only cv2/av qualify); slowfast modules keep their direct references
    for name in list(sys.modules):
        if name in ("cv2", "av") or name.startswith(("cv2.", "av.")):
            mod = sys.modules.get(name)
            if mod is not None and REFSHIM in (
                getattr(mod, "__file__", "") or ""
            ):
                del sys.modules[name]


def small_cfg_pairs(torch_reference, **overrides):
    """Matching (reference cfg, svit_tpu cfg) reduced for CPU-speed tests."""
    _, ref_defaults = torch_reference
    from svit_tpu.config import get_cfg

    ref_cfg = ref_defaults.get_cfg()
    ref_cfg.merge_from_file(os.path.join(REFERENCE, "configs", "ssv2.yaml"))
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))

    small = dict(
        {
            ("DATA", "TRAIN_CROP_SIZE"): 56,
            ("DATA", "TEST_CROP_SIZE"): 56,
            ("DATA", "NUM_FRAMES"): 4,
            ("NUM_GPUS",): 0,
            ("TRAIN", "MIXED_PRECISION"): False,
        }
    )
    for c in (ref_cfg, cfg):
        for path, v in small.items():
            node = c
            for p in path[:-1]:
                node = node[p]
            node[path[-1]] = v
        for path, v in overrides.items():
            node = c
            keys = path.split(".")
            for p in keys[:-1]:
                node = node[p]
            node[keys[-1]] = v
    return ref_cfg, cfg
