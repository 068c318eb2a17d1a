from points2surf_tpu.train.trainer import Trainer, output_spec  # noqa: F401
