from qeft_tpu.utils.profiling import phase_timer, profile_trace, Telemetry
