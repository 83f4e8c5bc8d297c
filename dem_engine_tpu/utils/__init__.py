from . import io, obj_loader, samplers  # noqa: F401
