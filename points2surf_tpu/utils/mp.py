"""Process-pool fan-out for offline work (reference source/base/utils_mp.py).

Used by datagen, meshing, and metrics — the embarrassingly-parallel host
stages that stay on CPU by design (SURVEY §7.3).
"""

from __future__ import annotations

import multiprocessing
import subprocess


def start_process_pool(worker_function, parameters, num_processes,
                       timeout=None):
    """Serial when num_processes <= 1, else a Pool with maxtasksperchild=1
    (worker isolation, reference utils_mp.py:21-37)."""
    if len(parameters) == 0:
        return []
    if num_processes <= 1:
        return [worker_function(*p) for p in parameters]
    with multiprocessing.Pool(
        processes=num_processes, maxtasksperchild=1
    ) as pool:
        return pool.starmap(worker_function, parameters)


def mp_worker(call: str) -> int:
    """Run a shell command (external tools: Blender/meshlab equivalents,
    reference utils_mp.py:5-18)."""
    try:
        proc = subprocess.run(call, shell=True, check=False)
        return proc.returncode
    except Exception as e:
        print(f"mp_worker failed for call {call!r}: {e}")
        return -1
