from fmcw_radar_processing_tpu.dsp.windows import (  # noqa: F401
    blackman,
    chebwin,
    kaiser,
)
from fmcw_radar_processing_tpu.dsp.fast_time import (  # noqa: F401
    FastTimeOperator,
    range_profile,
)
from fmcw_radar_processing_tpu.dsp.detection import (  # noqa: F401
    DetectionResult,
    search_peaks,
)
from fmcw_radar_processing_tpu.dsp.slow_time import (  # noqa: F401
    SlowTimeOperator,
    doppler_peaks,
)
from fmcw_radar_processing_tpu.dsp.stft import (  # noqa: F401
    SpectrogramResult,
    StftOperator,
    log_frequency_rescale,
)
