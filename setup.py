"""Build for the woft_native C++ extension (threaded JPEG decode +
BGR->RGB f32 conversion + prefetch pipeline). Pure-Python woft_tpu needs no
build; this compiles only the native host-data-path module.

    python setup.py build_ext --inplace
"""

import numpy
from setuptools import Extension, setup

setup(
    name="woft_tpu",
    version="0.1.0",
    packages=["woft_tpu"],
    ext_modules=[
        Extension(
            "woft_native",
            sources=["woft_tpu/native/loader.cpp"],
            include_dirs=[numpy.get_include()],
            libraries=["jpeg"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native",
                                "-Wall"],
        )
    ],
)
