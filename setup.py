"""Build the native I/O extension: python setup.py build_ext --inplace
(or `make native`). The package works without it (pure-Python fallback in
lbm_tpu.io), but large-grid final_state writes are ~10x slower."""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "lbm_tpu._native",
            sources=["lbm_tpu/_native_src/lbm_io.c"],
            extra_compile_args=["-O2", "-Wall"],
        )
    ]
)
