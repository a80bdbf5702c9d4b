"""Build the native IO runtime:  python native/setup.py build_ext --inplace
(from the repo root; the .so lands in particle_simulation_tpu/utils/)."""

import os
from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="particle_simulation_tpu_native",
    ext_modules=[
        Extension(
            "particle_simulation_tpu.utils._fastio",
            sources=[os.path.join(here, "fastio.c")],
            libraries=["z"],
            extra_compile_args=["-O2"],
        )
    ],
    script_args=["build_ext", "--inplace"],
)
