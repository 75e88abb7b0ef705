from orb_slam_free_space_carving_tpu.utils import lie, camera  # noqa: F401
