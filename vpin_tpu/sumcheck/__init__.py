from .sumcheck import (
    UniPoly, SumcheckInstanceProof, ZKSumcheckInstanceProof,
)

__all__ = ["UniPoly", "SumcheckInstanceProof", "ZKSumcheckInstanceProof"]
