"""Packaging shim (reference ships a setup.py: /root/reference/setup.py).

Builds the optional native PT-MPO builder (native/libptmpo_native.so) at
install time when a C++ toolchain is available; the library falls back to the
pure-numpy builder otherwise, so the build is best-effort.
"""

import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(["make", "-C", "native"], check=True, timeout=300)
        except Exception as exc:  # toolchain optional
            print("ptmpo_native build skipped: {}".format(exc))
        super().run()


setup(cmdclass={"build_py": BuildWithNative},
      package_data={"pyaceqd_tpu": []},
      data_files=[("native", ["native/ptmpo_native.cpp", "native/Makefile"])])
