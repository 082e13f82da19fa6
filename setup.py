"""Build hook: compile the native host-ops library into the package.

The C++ host ops (native/host_ops.cpp: sorted pick-closest sweep, CSR
Bellman-Ford) are optional accelerators — every caller has a pure-numpy
fallback — so compilation is best-effort: no toolchain, no extension,
the wheel still works.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "host_ops.cpp")
        if not os.path.exists(src):
            return
        dest_pkg = os.path.join(self.build_lib, "isokann_tpu")
        os.makedirs(dest_pkg, exist_ok=True)
        out = os.path.join(dest_pkg, "libisokann_host.so")
        cxx = os.environ.get("CXX", "g++")
        try:
            subprocess.run(
                [cxx, "-O3", "-fPIC", "-std=c++17", "-shared",
                 "-o", out, src],
                check=True, capture_output=True)
            print(f"built native host ops -> {out}")
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"native host ops skipped ({e}); numpy fallbacks "
                  "will be used")


setup(cmdclass={"build_py": BuildWithNative})
