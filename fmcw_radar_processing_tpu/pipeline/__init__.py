from fmcw_radar_processing_tpu.pipeline.frame_chain import (  # noqa: F401
    FrameChainOutputs,
    make_frame_chain,
    pack_slow_time,
)
from fmcw_radar_processing_tpu.pipeline.recording import (  # noqa: F401
    ActivityBatchOutput,
    RadarPipeline,
    RecordingOutputs,
)
from fmcw_radar_processing_tpu.pipeline.streaming import (  # noqa: F401
    StreamingProcessor,
    StreamingWindowResult,
)
from fmcw_radar_processing_tpu.pipeline.payloads import (  # noqa: F401
    fft_snapshot_payload,
    range_fft_payload,
    range_speed_payload,
    spectrogram_payload,
)
