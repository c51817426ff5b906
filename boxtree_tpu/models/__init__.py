from boxtree_tpu import config  # noqa: F401
from boxtree_tpu.models.constant_one import (
    ConstantOneExpansionWrangler,
    ConstantOneTreeIndependentDataForWrangler,
)
from boxtree_tpu.models.helmholtz import (
    Helmholtz2DExpansionWrangler,
    HelmholtzTreeIndependentDataForWrangler,
    make_helmholtz_wrangler,
)
from boxtree_tpu.models.laplace import (
    Laplace2DExpansionWrangler,
    Laplace3DExpansionWrangler,
    LaplaceTreeIndependentDataForWrangler,
    make_laplace_wrangler,
)

__all__ = [
    "ConstantOneExpansionWrangler",
    "Helmholtz2DExpansionWrangler",
    "HelmholtzTreeIndependentDataForWrangler",
    "make_helmholtz_wrangler",
    "ConstantOneTreeIndependentDataForWrangler",
    "Laplace2DExpansionWrangler",
    "Laplace3DExpansionWrangler",
    "LaplaceTreeIndependentDataForWrangler",
    "make_laplace_wrangler",
]
