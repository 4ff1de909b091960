"""abs_oco loader logic (IDL layout mocked — scipy can only read .sav)."""

import numpy as np
import pytest

from er3t_tpu.pre import abs_oco
from er3t_tpu.pre.atm import atm_atmmod


def test_abs_oco_selection_and_interp(monkeypatch, tmp_path):
    ng, nz_db, nwl = 11, 10, 5
    wvls = np.linspace(757.0, 773.0, nwl)
    rng = np.random.default_rng(0)
    db = {
        'wvls': wvls,
        'abso': rng.uniform(0.01, 1.0, (ng, nz_db, nwl)),
        'slit': np.abs(rng.normal(1.0, 0.1, (ng, nwl))),
        'solar': rng.uniform(1.0, 2.0, (nwl, ng)),
    }
    db['weight'] = db['slit'] / db['slit'].sum(axis=0, keepdims=True)
    monkeypatch.setattr(abs_oco, 'load_oco_idl', lambda f: db)
    fake = tmp_path / 'o2a.out'
    fake.write_bytes(b'x')

    atm = atm_atmmod(np.linspace(0, 20, 21))
    coef = abs_oco.abs_oco_idl(765.0, atm, str(fake))
    assert coef.abso_coef.shape == (20, ng)
    i = np.abs(wvls - 765.0).argmin()
    assert coef.wvl == pytest.approx(wvls[i])
    np.testing.assert_allclose(coef.weight.sum(), 1.0, rtol=1e-6)
    with pytest.raises(ValueError):
        abs_oco.abs_oco_idl(800.0, atm, str(fake))


def test_abs_oco_h5_roundtrip(tmp_path):
    """abs_oco_h5 reads the reference's HDF5 layout (abs_crk.py:1673-1814):
    per-wavelength variable g counts, slit-derived weights, layer interp."""
    import h5py
    import numpy as np
    from er3t_tpu.pre.atm import atm_atmmod

    nwl, ngmax, nz_db = 3, 5, 10
    rng = np.random.default_rng(1)
    fn = tmp_path / 'oco.h5'
    absgl = rng.uniform(0.1, 1.0, (nz_db, nwl, ngmax))
    absgy = rng.uniform(0.5, 1.5, (nwl, ngmax))
    with h5py.File(fn, 'w') as f:
        f['lamx'] = np.array([0.758, 0.760, 0.762])    # um
        f['absgn'] = np.array([5, 4, 5])
        f['absgx'] = np.tile(np.linspace(0.7599, 0.7601, ngmax), (nwl, 1))
        f['absgl'] = absgl
        f['absgy'] = absgy
        f['solx'] = np.full((nwl, ngmax), 1.2)
    atm = atm_atmmod(np.linspace(0, 20, 21))
    coef = abs_oco.abs_oco_h5(760.05, atm, str(fn))
    assert coef.wvl == pytest.approx(760.0)
    assert coef.ng == 4                              # absgn of sample 1
    assert coef.abso_coef.shape == (20, 4)
    np.testing.assert_allclose(coef.weight.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(coef.weight,
                               absgy[1, :4] / absgy[1, :4].sum())
    with pytest.raises(ValueError, match='nearest'):
        abs_oco.abs_oco_h5(780.0, atm, str(fn))
