from .rounding import round_matlab, round_half_even_decimals
from .windows import nuttall, nuttall_masked, hanning_matlab, hann_numpy
from .interp import (
    interp1_extrap,
    interp1_sorted_descending_extrap,
    interp1h_uniform,
)
from .iir import (
    linear_recurrence,
    lfilter,
    filtfilt,
    decimate_matlab,
    decimate_world,
)
from .zc import zero_crossing_events, Events
from .minphase import mirror_full, minimum_phase_spectrum, minimum_phase_response

__all__ = [
    "round_matlab", "round_half_even_decimals",
    "nuttall", "nuttall_masked", "hanning_matlab", "hann_numpy",
    "interp1_extrap", "interp1_sorted_descending_extrap", "interp1h_uniform",
    "linear_recurrence", "lfilter", "filtfilt", "decimate_matlab", "decimate_world",
    "zero_crossing_events", "Events",
    "mirror_full", "minimum_phase_spectrum", "minimum_phase_response",
]
