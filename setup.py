from setuptools import find_packages, setup

setup(
    name="llava-reward-tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) framework for multimodal reward models "
        "with Bradley-Terry / General-Preference / classification heads"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "pyyaml"],
    extras_require={
        "train": ["optax", "orbax-checkpoint"],
        "io": ["torch", "safetensors", "transformers"],
        "data": ["datasets", "pillow"],
    },
)
