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
