"""Pure compute ops: losses, sampling, mixup, schedules, pallas kernels."""
