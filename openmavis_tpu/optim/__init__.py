from . import inertial, lm, pose_opt, reprojection, robust  # noqa: F401
