"""Scenario suite: one configured problem per reference script family.

Each ``build_*`` function returns a dict with the configured OCP, solver,
closed-loop runner, parameter tensors, and metadata; ``run_*`` executes the
closed loop and returns reference-style metrics.  Constants are the exact
values from the reference scripts (cited per module).
"""
from .diffdrive import build_diffdrive, run_diffdrive
from .circular import build_circular_tracking, run_circular_tracking
from .lane_change import build_lane_change_lti, run_lane_change_lti
from .ltv import build_lane_change_ltv, build_leitura, run_lane_change_ltv
from .dynamic_bicycle import build_dynamic_bicycle, run_dynamic_bicycle
from .frenet import build_frenet, run_frenet
from .pendulum import build_pendulum, run_pendulum
from .curvature import build_curvature_ltv, run_curvature_ltv
from .fleet import build_fleet, run_fleet
from .compare import compare_diffdrive_methods
