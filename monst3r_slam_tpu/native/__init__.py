"""Native (C++) host runtime components, loaded via ctypes."""

from monst3r_slam_tpu.native.build import load_solver  # noqa: F401
