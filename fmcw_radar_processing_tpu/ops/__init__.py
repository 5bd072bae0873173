from fmcw_radar_processing_tpu.ops.fast_time_pallas import (  # noqa: F401
    fast_time_pallas,
)
from fmcw_radar_processing_tpu.ops.detect_pallas import (  # noqa: F401
    search_peaks_pallas,
)
