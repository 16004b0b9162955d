"""System / device telemetry helpers.

TPU-native equivalents of the reference's GPU/RAM status prints
(reference: utils/utils.py:98-130) plus a jax.profiler trace context for
performance work (the reference has no profiler; SURVEY §5).
"""

from __future__ import annotations

import contextlib
import os
import time
from datetime import datetime
from typing import Dict, Iterator, Optional


def get_timestamp() -> str:
    return datetime.now().strftime("%m%d-%H%M%S")


def print_device_status() -> None:
    """HBM usage per device (analog of print_gpu_status)."""
    import jax

    print("[+] Device Status")
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit", 0) / 2 ** 30
            used = stats.get("bytes_in_use", 0) / 2 ** 30
            print(f"  {dev}: {used:.2f} / {limit:.2f} GiB HBM in use")
        except Exception:
            print(f"  {dev}: memory stats unavailable")


def print_ram_status() -> None:
    """Host RSS (analog of print_ram_status)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    kb = int(line.split()[1])
                    print(f"[+] Memory Status\n Usage: {kb / 1024:10.5f} MB")
                    return
    except OSError:
        pass
    print("[+] Memory Status unavailable")


def print_system_envs() -> None:
    """Device/CPU/memory inventory (analog of print_system_envs)."""
    import jax

    num_cpus = os.cpu_count()
    devices = jax.devices()
    print(
        "[+] System environments\n",
        f"The number of devices : {len(devices)} ({jax.default_backend()})\n",
        f"The number of cpus : {num_cpus}\n",
    )


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/p4fr_profile") -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard/xprof."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time / throughput counter for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self.last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self.last is not None:
            self.times.append(now - self.last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self.last = now

    def stats(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self.times:
            return {"step_ms": 0.0, "items_per_sec": 0.0}
        mean = sum(self.times) / len(self.times)
        return {
            "step_ms": mean * 1000.0,
            "items_per_sec": items_per_step / mean if mean else 0.0,
        }
