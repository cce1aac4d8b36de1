from monst3r_slam_tpu.core import lie, geometry, robust, image  # noqa: F401
