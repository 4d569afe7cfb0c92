from .base import Model, LinearModel, linear_model
from .unicycle import unicycle, UNICYCLE_NX, UNICYCLE_NU
from .pendulum import cart_pendulum_linear
from .bicycle import (
    lateral_error_lti,
    lateral_error_ltv_coeffs,
    dynamic_bicycle_coeffs,
    dynamic_bicycle_ltv,
    AR_DEFAULT,
    BR_DEFAULT,
)
from .frenet import frenet_path_frame
