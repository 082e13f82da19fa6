"""Block until the TPU backend is reachable (or give up), hang-safe.

Reuses bench.py's hardened discovery loop but stops at the killable
SUBPROCESS probes: the tunnel's worst failure mode is an in-process
device claim that HANGS indefinitely (CLAUDE.md, seen 2026-08-18), so
this tool never touches the backend in-process — its exit is bounded by
max_wait + one probe timeout even when the tunnel wedges mid-claim.
Exit code 0 = a throwaway subprocess enumerated devices successfully.

Usage: python -u tools/wait_tpu.py [max_wait_seconds (default 900)]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if __name__ == "__main__":
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
    import bench
    try:
        n = bench.wait_for_devices_hang_safe(
            max_wait=max_wait,
            # subprocess probe already proved the backend answers;
            # skip the unbounded in-process claim entirely
            wait=lambda max_wait: "probe-ok")
        print(f"devices: {n}")
    except Exception as e:
        print(f"unavailable after {max_wait:.0f}s: {e}")
        sys.exit(1)
