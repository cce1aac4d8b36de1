from monst3r_slam_tpu.models.config import ModelConfig  # noqa: F401
