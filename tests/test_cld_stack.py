"""COT conservation of the 2D->3D cloud stacking (cld_gen_cop / cld_sat).

Regression for the layer-center membership stacking, which dropped
sub-layer clouds entirely and scaled COT by n_layers*dz/cgt whenever the
geometric thickness was not a layer multiple.
"""

import numpy as np
import pytest

from er3t_tpu.pre.cld import cld_gen_cop


def _total_cot(cld):
    return (cld.extinction * 1000.0 * cld.thickness[None, None, :]).sum(-1)


@pytest.mark.parametrize('cth,cgt,dz', [
    (0.55, 0.05, 0.1),    # sub-layer slab between two layer centers
    (0.55, 0.15, 0.1),    # cgt not a layer multiple
    (0.55, 0.55, 0.1),    # default cgt = cth
    (2.0, 1.0, 0.1),      # clean multiple
    (2.0, 0.0, 0.1),      # degenerate zero thickness
    (2.5, 1.0, 0.3),      # cth not a dz multiple
])
def test_cot_conserved(cth, cgt, dz):
    cot = 10.0
    c = cld_gen_cop(np.full((3, 2), cot), np.full((3, 2), 12.0),
                    np.full((3, 2), cth), np.full((3, 2), cgt), dz=dz)
    np.testing.assert_allclose(_total_cot(c), cot, rtol=1e-9)
    # extinction confined to [cth-cgt, cth] (one dz of slack for the
    # degenerate-cgt slab and edge layers)
    zmax = c.altitude[np.where(c.extinction[0, 0] > 0)[0]]
    if zmax.size:
        assert zmax.max() <= cth + dz
        assert zmax.min() >= cth - max(cgt, dz) - dz


def test_nan_cth_is_clear():
    """Non-finite cloud-top pixels become clear instead of crashing or
    injecting NaN extinction (all-NaN swaths included)."""
    cot = np.full((2, 2), 5.0)
    cth = np.full((2, 2), np.nan)
    c = cld_gen_cop(cot, np.full((2, 2), 12.0), cth, dz=0.1)
    assert np.isfinite(c.extinction).all()
    assert _total_cot(c).max() == 0.0
    # mixed: one valid pixel keeps its cloud
    cth[0, 0] = 1.5
    c = cld_gen_cop(cot, np.full((2, 2), 12.0), cth, dz=0.1)
    t = _total_cot(c)
    assert t[0, 0] == pytest.approx(5.0, rel=1e-9)
    assert t[1, 1] == 0.0


def test_partial_layer_split():
    """A slab straddling a layer edge splits COT by exact overlap."""
    # cloud [0.45, 0.65] over layers [0.4,0.5),[0.5,0.6),[0.6,0.7)
    c = cld_gen_cop(np.full((1, 1), 6.0), np.full((1, 1), 10.0),
                    np.full((1, 1), 0.65), np.full((1, 1), 0.2), dz=0.1)
    ext = c.extinction[0, 0] * 1000.0 * 0.1          # per-layer COT
    k = np.where(ext > 0)[0]
    frac = ext[k] / 6.0
    np.testing.assert_allclose(sorted(frac), [0.25, 0.25, 0.5], rtol=1e-9)
