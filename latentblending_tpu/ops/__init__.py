from latentblending_tpu.ops.interp import (
    interpolate_linear,
    interpolate_linear_pytree,
    interpolate_spherical,
    interpolate_spherical_batched,
)
from latentblending_tpu.ops.scheduler import (
    SDXL_BASE_SCHEDULER,
    SDXL_TURBO_SCHEDULER,
    SchedulerConfig,
    SchedulerState,
    euler_step,
    make_schedule,
    scale_model_input,
)
from latentblending_tpu.ops.schedules import (
    branch1_crossfeed_coeffs,
    frame_insert_counts,
    get_closest_idx,
    guidance_mid_dampening,
    parental_crossfeed_coeffs,
    time_based_branching_plan,
    turbo_branching_plan,
)

__all__ = [
    "interpolate_linear",
    "interpolate_linear_pytree",
    "interpolate_spherical",
    "interpolate_spherical_batched",
    "SchedulerConfig",
    "SchedulerState",
    "SDXL_BASE_SCHEDULER",
    "SDXL_TURBO_SCHEDULER",
    "make_schedule",
    "scale_model_input",
    "euler_step",
    "branch1_crossfeed_coeffs",
    "parental_crossfeed_coeffs",
    "guidance_mid_dampening",
    "turbo_branching_plan",
    "time_based_branching_plan",
    "get_closest_idx",
    "frame_insert_counts",
]
