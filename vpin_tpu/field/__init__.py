from .prime_field import (
    FQ,
    FP,
    L_MODULUS,
    P_MODULUS,
    N_LIMBS,
    LIMB_BITS,
    PrimeField,
    int_to_limbs,
    limbs_to_int,
)

__all__ = [
    "FQ", "FP", "L_MODULUS", "P_MODULUS", "N_LIMBS", "LIMB_BITS",
    "PrimeField", "int_to_limbs", "limbs_to_int",
]
