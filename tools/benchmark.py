#!/usr/bin/env python3
"""Data-loading throughput benchmark (reference ``tools/benchmark.py`` +
``slowfast/utils/benchmark.py``): iterates the train loader for
``BENCHMARK.NUM_EPOCHS`` epochs and logs iters/sec + clips/sec."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svit_tpu.config import assert_and_infer_cfg, load_config, parse_args
from svit_tpu.utils import logging

logger = logging.get_logger(__name__)


def benchmark_data_loading(cfg):
    logging.setup_logging(cfg.OUTPUT_DIR)
    from svit_tpu.data import construct_loader, shuffle_dataset

    video_loader, image_loader = construct_loader(cfg, "train", mesh_data=1)
    log_period = cfg.BENCHMARK.LOG_PERIOD
    for epoch in range(cfg.BENCHMARK.NUM_EPOCHS):
        if cfg.BENCHMARK.SHUFFLE:
            shuffle_dataset((video_loader, image_loader), epoch)
        num_clips = 0
        t_start = time.perf_counter()
        t0 = t_start
        for it, batch in enumerate(video_loader):
            num_clips += int(batch["weight"].sum())
            if (it + 1) % log_period == 0:
                dt = time.perf_counter() - t0
                logging.log_json_stats(
                    {
                        "_type": "benchmark_iter",
                        "epoch": epoch,
                        "iter": it + 1,
                        "iters_per_sec": log_period / dt,
                        "clips_per_sec": num_clips / (time.perf_counter() - t_start),
                    }
                )
                t0 = time.perf_counter()
        total = time.perf_counter() - t_start
        logging.log_json_stats(
            {
                "_type": "benchmark_epoch",
                "epoch": epoch,
                "seconds": total,
                "clips_per_sec": num_clips / total,
            }
        )


def main():
    cfg = assert_and_infer_cfg(load_config(parse_args()))
    benchmark_data_loading(cfg)


if __name__ == "__main__":
    main()
