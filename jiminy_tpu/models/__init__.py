from jiminy_tpu.models.joints import JointType  # noqa: F401
from jiminy_tpu.models.model import RobotModel, build_model  # noqa: F401
from jiminy_tpu.models.urdf import build_model_from_urdf  # noqa: F401
