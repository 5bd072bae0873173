from fmcw_radar_processing_tpu.serve.handler import (  # noqa: F401
    HandlerConfig,
    RadarService,
    main,
)
