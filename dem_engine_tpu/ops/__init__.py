from . import quat, voxel  # noqa: F401
