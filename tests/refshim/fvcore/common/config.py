from svit_tpu.config.cfg_node import CfgNode  # noqa
