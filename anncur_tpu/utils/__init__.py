from anncur_tpu.utils.tracker import ExperimentTracker, trace_profile  # noqa: F401
