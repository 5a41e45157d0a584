"""Build the native host-kernel extension:

    cd native && python setup.py build_ext --inplace

pin_slam_tpu.utils.native loads the built module if present and otherwise
falls back to the numpy implementations.
"""

from setuptools import Extension, setup

setup(
    name="pin_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "pin_native",
            sources=["pin_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ],
)
