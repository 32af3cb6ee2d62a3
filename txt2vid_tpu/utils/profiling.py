"""Profiling / tracing (aux-subsystem parity, SURVEY.md §5).

The reference's tracing story is Stopwatch wall-clock + CUDA max-memory prints
(gan/trainer.py:281-288). Here: the same rolling step/sec telemetry lives in the
trainer; this module adds the TPU-native layer — jax.profiler traces viewable in
TensorBoard/XProf, a step-annotation helper, and device-memory stats."""

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the duration of the context."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: int):
    """Annotate a training step inside an active trace."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def device_memory_stats():
    """Per-device memory stats (bytes) where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats


def format_memory_stats() -> str:
    parts = []
    for dev, s in device_memory_stats().items():
        peak = (s.get("peak_bytes_in_use") or 0) / 1e9
        used = (s.get("bytes_in_use") or 0) / 1e9
        parts.append(f"{dev}: {used:.2f}GB used, {peak:.2f}GB peak")
    return "; ".join(parts) if parts else "no device memory stats"
