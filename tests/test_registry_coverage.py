"""Registry coverage: every capability the reference exposes resolves here."""

import os

from hypergraph_diffusion_for_recommendation_tpu.models import MODEL_REGISTRY

# model files committed in the reference's model/graph/ (survey 2.5)
REFERENCE_MODEL_FILES = [
    "AutoCF", "DHCF", "DHCF_diffusion", "HCCF", "HCCF_diffusion", "HD", "HD2",
    "HGCN", "HGNNAblation", "HGNN_HD", "HGNN_HD2", "HGNN_HD3", "HGNN_HD4",
    "KGAT", "KHGRec", "LRMRec", "LightGCN", "LocalEncoder", "SGL", "SHT",
    "WaveletHD", "WaveletHD2",
]
# HGNN_cp.py holds `class HGNN` (the broken --model=HGNN import, survey 7.4)
REFERENCE_CLASSES = ["HGNN"]
# registry names whose files were never committed upstream but are part of
# the advertised surface (main.py:99-108)
REFERENCE_REGISTRY_ONLY = [
    "MF", "DirectAU", "SASRec", "CL4SRec", "SGL", "SimGCL", "SEPT", "MHCN",
    "SSL4Rec", "XSimGCL", "NCL", "MixGCF", "HKGRippleNet", "BUIR", "SelfCF",
] + [f"KHGRec_variation{i}" for i in range(1, 10)]  # main.py:100, no files upstream
# notebook-only models (root *.ipynb)
REFERENCE_NOTEBOOKS = ["KGIN", "KGCL", "KTUP"]


def test_all_reference_models_registered():
    wanted = set(
        REFERENCE_MODEL_FILES + REFERENCE_CLASSES + REFERENCE_REGISTRY_ONLY + REFERENCE_NOTEBOOKS
    )
    missing = wanted - set(MODEL_REGISTRY)
    assert not missing, f"unregistered reference capabilities: {sorted(missing)}"


def test_registry_size():
    # 34+ registered models
    assert len(MODEL_REGISTRY) >= 34, sorted(MODEL_REGISTRY)
