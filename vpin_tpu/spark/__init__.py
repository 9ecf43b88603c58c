from .sparse_mlpoly import (
    SparseMatPolyCommitmentGens, SparseMatPolyCommitment,
    MultiSparseMatPolynomialAsDense, SparseMatPolyEvalProof, R1CSEvalProof,
    multi_commit,
)
from .product_tree import (
    BatchedProductCircuits, BatchedDotProducts, ProductCircuitEvalProofBatched,
)

__all__ = [
    "SparseMatPolyCommitmentGens", "SparseMatPolyCommitment",
    "MultiSparseMatPolynomialAsDense", "SparseMatPolyEvalProof",
    "R1CSEvalProof", "multi_commit", "BatchedProductCircuits",
    "BatchedDotProducts", "ProductCircuitEvalProofBatched",
]
