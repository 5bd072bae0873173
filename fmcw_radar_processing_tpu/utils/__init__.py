from fmcw_radar_processing_tpu.utils.jsonio import dumps_matlab, write_json  # noqa: F401
