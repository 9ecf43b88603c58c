from .r1cs import R1CSInstance, SparseMat
from .r1csproof import (
    R1CSGens, R1CSProof, PolyCommitment, PolyEvalProof,
    poly_commit, combined_commit, r1cs_prove_cp, r1cs_verify_cp,
)
from .cp_snark import (
    SNARKGens, CPSnarkProof, cp_commit_witness, cp_snark_prove,
    cp_snark_verify, pad_assignment, snark_encode,
)
from .nizk_api import NIZK, NIZKGens, instance_digest
from .stock import SNARK, produce_synthetic_r1cs, snark_prove_synthetic

__all__ = [
    "R1CSInstance", "SparseMat", "R1CSGens", "R1CSProof", "PolyCommitment",
    "PolyEvalProof", "poly_commit", "combined_commit", "r1cs_prove_cp",
    "r1cs_verify_cp", "SNARKGens", "CPSnarkProof", "cp_commit_witness",
    "cp_snark_prove", "cp_snark_verify", "pad_assignment", "snark_encode",
    "NIZK", "NIZKGens", "instance_digest",
    "SNARK", "produce_synthetic_r1cs", "snark_prove_synthetic",
]
