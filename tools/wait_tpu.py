"""Block until the TPU backend is reachable (or give up).

Reuses bench.py's hardened discovery (exponential backoff + backend
cache reset between attempts — the axon tunnel can block device claims
for minutes, CLAUDE.md).  Exit code 0 = devices available.

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
        devs = bench.wait_for_devices_hang_safe(max_wait=max_wait)
        print(f"devices: {devs}")
    except Exception as e:
        print(f"unavailable after {max_wait:.0f}s: {e}")
        sys.exit(1)
