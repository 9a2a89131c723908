from .dialect import (
    day_name,
    epoch_us,
    floor_div,
    month_name,
    time_key,
    window_start_sec,
)

__all__ = [
    "day_name",
    "epoch_us",
    "floor_div",
    "month_name",
    "time_key",
    "window_start_sec",
]
