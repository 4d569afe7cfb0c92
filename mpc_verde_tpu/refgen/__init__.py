from .trajectories import (
    circular_reference_params,
    synthetic_lane_change,
    extend_lane_change_course,
    double_lane_change_course,
)
from .synthesis import lateral_error_references, path_heading, stage_param_tensor
from .io import load_path_csv, reference_data_dir
