"""Multi-view test engine (reference ``tools/test_net.py``).

The dataset pre-replicates every video x(NUM_ENSEMBLE_VIEWS x
NUM_SPATIAL_CROPS); batched sharded inference runs over the mesh and the
host-side ``TestMeter`` sum-ensembles per-clip softmax scores into video
slots and finalizes top-1/top-5 (reference ``test_net.py:24-171``,
``meters.py:237-398``).
"""

from __future__ import annotations

import pickle
import pprint

import jax
import jax.numpy as jnp
import numpy as np

from svit_tpu.data import construct_loader
from svit_tpu.engine import meters as meters_lib
from svit_tpu.engine import steps
from svit_tpu.models import build_model
from svit_tpu.parallel import mesh as meshlib
from svit_tpu.utils import checkpoint as cu
from svit_tpu.utils import logging

logger = logging.get_logger(__name__)


def perform_test(cfg, test_jit, params, test_loader, test_meter, data_sh):
    test_meter.iter_tic()
    for cur_iter, batch in enumerate(test_loader):
        vb = {"clips": jax.device_put(batch["clips"], data_sh)}
        preds = np.asarray(jax.device_get(test_jit(params, vb)))
        weight = batch["weight"]
        valid = weight > 0
        test_meter.update_stats(
            preds[valid], batch["labels"][valid], batch["index"][valid]
        )
        test_meter.iter_toc()
        test_meter.log_iter_stats(cur_iter)
        test_meter.iter_tic()
    return test_meter.finalize_metrics()


def test(cfg):
    np.random.seed(cfg.RNG_SEED)
    logging.setup_logging(cfg.OUTPUT_DIR)
    logger.info("Test with config:")
    logger.info(pprint.pformat(cfg.to_dict()))

    mesh = meshlib.build_mesh(cfg)
    mesh_data = mesh.shape["data"]

    model, arch = build_model(cfg)
    test_loader = construct_loader(cfg, "test", mesh_data)

    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    num_items = test_loader.dataset.num_videos
    assert num_items % num_clips == 0, (
        f"test set size {num_items} not divisible by {num_clips} views"
    )

    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    x0 = jnp.zeros((1, T, S, S, 3), jnp.float32)

    with mesh:
        abstract = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)}, x0, deterministic=True
            )
        )
        shardings = meshlib.param_sharding(mesh, abstract["params"])

        ckpt_path = cu.load_test_checkpoint_path(cfg)
        if ckpt_path:
            loaded = cu.load_params_any(ckpt_path, abstract["params"])
            params = jax.device_put(loaded["params"], shardings)
            logger.info("Loaded test checkpoint %s", ckpt_path)
        else:
            params = jax.jit(
                lambda: model.init(
                    {"params": jax.random.PRNGKey(0)}, x0, deterministic=True
                )["params"],
                out_shardings=shardings,
            )()

        nc = arch.num_classes if isinstance(arch.num_classes, int) else 0
        test_meter = meters_lib.TestMeter(
            num_items // num_clips,
            num_clips,
            nc,
            len(test_loader),
            cfg.DATA.ENSEMBLE_METHOD,
        )
        test_jit = jax.jit(steps.make_test_step(model))
        data_sh = meshlib.data_sharding(mesh)
        stats = perform_test(cfg, test_jit, params, test_loader, test_meter, data_sh)

    if cfg.TEST.SAVE_RESULTS_PATH:
        with open(cfg.TEST.SAVE_RESULTS_PATH, "wb") as f:
            pickle.dump(
                {"video_preds": test_meter.video_preds,
                 "video_labels": test_meter.video_labels},
                f,
            )
    return stats
