"""Package install for block2_preview_tpu (no external deps beyond the
baked-in jax/numpy/scipy stack)."""
from setuptools import find_packages, setup

setup(
    name="block2_preview_tpu",
    version="0.1.0",
    description="TPU-native ab initio DMRG (block2-capability rebuild)",
    packages=find_packages(include=["block2_preview_tpu*"]),
    python_requires=">=3.10",
    entry_points={"console_scripts": [
        "block2main_tpu = block2_preview_tpu.driver.main:main"]},
)
