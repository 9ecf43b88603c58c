"""vpin-tpu: a TPU-native verifiable encrypted-inference framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
vt-asaplab/vPIN (ACSAC 2024): exponential-ElGamal encrypted CNN inference
over curve E2, Freivalds-style rLC verification with EC witness traces,
and a commit-and-prove Spartan zkSNARK over ristretto255.
"""

__version__ = "0.1.0"
