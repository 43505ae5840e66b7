from .smpl import BodyModel, load_smpl_model, lbs, rodrigues, synthetic_body_model
from .server import SMPLServer, canonical_pose_params
from .params import BodyParamTable

__all__ = [
    "BodyModel",
    "load_smpl_model",
    "lbs",
    "rodrigues",
    "synthetic_body_model",
    "SMPLServer",
    "canonical_pose_params",
    "BodyParamTable",
]
