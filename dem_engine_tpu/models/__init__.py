from .force_model import ForceModel, ContactContext  # noqa: F401
from .hertz import HertzianForceModel, HertzianFrictionlessForceModel  # noqa: F401
from .prescriptions import FamilyPrescription, FamilyChange, fixed  # noqa: F401
