from boxtree_tpu import config  # noqa: F401
from boxtree_tpu.models.constant_one import (
    ConstantOneExpansionWrangler,
    ConstantOneTreeIndependentDataForWrangler,
)
from boxtree_tpu.models.helmholtz import (
    Helmholtz2DExpansionWrangler,
    Helmholtz2DPairsExpansionWrangler,
    HelmholtzTreeIndependentDataForWrangler,
)
from boxtree_tpu.models.helmholtz3d import (
    Helmholtz3DExpansionWrangler,
    Helmholtz3DPairsExpansionWrangler,
    Helmholtz3DTreeIndependentDataForWrangler,
    make_helmholtz_wrangler,
)
from boxtree_tpu.models.laplace import (
    Laplace2DExpansionWrangler,
    Laplace2DPairsExpansionWrangler,
    Laplace3DExpansionWrangler,
    Laplace3DPairsExpansionWrangler,
    LaplaceTreeIndependentDataForWrangler,
    make_laplace_wrangler,
)

__all__ = [
    "ConstantOneExpansionWrangler",
    "ConstantOneTreeIndependentDataForWrangler",
    "Helmholtz2DExpansionWrangler",
    "Helmholtz2DPairsExpansionWrangler",
    "Helmholtz3DExpansionWrangler",
    "Helmholtz3DPairsExpansionWrangler",
    "Helmholtz3DTreeIndependentDataForWrangler",
    "HelmholtzTreeIndependentDataForWrangler",
    "Laplace2DExpansionWrangler",
    "Laplace2DPairsExpansionWrangler",
    "Laplace3DExpansionWrangler",
    "Laplace3DPairsExpansionWrangler",
    "LaplaceTreeIndependentDataForWrangler",
    "make_helmholtz_wrangler",
    "make_laplace_wrangler",
]
