"""Direct unit tests of the demo utilities (tnmf_tpu/utils/demo.py).

The streamlit demo *apps* are covered headless by tests/test_demos.py; these
tests pin the utility layer itself — widget wiring (ground-truth adoption,
channel controls), the SignalTool galleries, and the fit cache — the role of
the reference's ``tnmf/utils/demo.py`` sidebar/plot helpers.
"""

import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

from tnmf_tpu.utils.demo import (SignalTool, _FIT_CACHE, fit_nmf_model,
                                 st_define_nmf_params)


def test_define_params_adopts_ground_truth():
    # headless widgets return their defaults: both ground-truth checkboxes
    # stay ticked, so the oracle values are adopted verbatim
    oracle = dict(n_atoms=7, atom_shape=(11, 9))
    nmf_params, fit_params = st_define_nmf_params(oracle, have_ground_truth=True,
                                                  verbose=True)
    assert nmf_params['n_atoms'] == 7
    assert nmf_params['atom_shape'] == (11, 9)
    assert nmf_params['reconstruction_mode'] == 'valid'
    assert 'n_iterations' in fit_params  # full-batch default


def test_define_params_without_ground_truth_uses_widgets():
    oracle = dict(n_atoms=4, atom_shape=(5,))
    nmf_params, _ = st_define_nmf_params(oracle, have_ground_truth=False,
                                         verbose=False)
    # headless number_input returns its default (= the oracle value), but
    # through the widget path, not the adoption branch
    assert nmf_params['n_atoms'] == 4
    assert nmf_params['atom_shape'] == (5,)


def test_define_params_square_atoms_offer_rotations():
    nmf_params, _ = st_define_nmf_params(
        dict(n_atoms=3, atom_shape=(6, 6)), verbose=False)
    # square atoms: the transform selectbox offers rot90 options and the
    # headless default stays 'shift'
    assert nmf_params['transform_type'] == 'shift'


@pytest.mark.parametrize('ndim', [1, 2])
def test_signal_tool_generate_and_galleries(ndim):
    tool = SignalTool(ndim)
    np.random.seed(0)
    V, oracle = tool.st_generate_input(verbose=True)
    if ndim == 1:
        # defaults: 3 shapes x 3 channels, 3 signals of 3 x 20 samples
        assert V.shape == (3, 3, 60)
        assert oracle == dict(n_atoms=3, atom_shape=(20,))
    else:
        # defaults: color patches (3 patterns x 7 colors), one 3-channel image
        assert V.shape == (1, 3, 50, 50)
        assert oracle == dict(n_atoms=21, atom_shape=(10, 10))
    nmf_params, fit_params = st_define_nmf_params(oracle, verbose=False)
    fit_params['n_iterations'] = 3
    nmf = fit_nmf_model(V, nmf_params, fit_params)
    R = nmf.R
    assert R.shape == V.shape and np.isfinite(np.asarray(R)).all()
    # all three galleries must render headless, verbose on
    tool.st_compare_signals(V, R, verbose=True)
    tool.st_compare_individual_signals(V, R, verbose=True)
    tool.st_plot_partial_reconstructions(V, nmf, verbose=True)


def test_signal_tool_rejects_unsupported_rank():
    with pytest.raises(ValueError, match='dimensions'):
        SignalTool(3)


def test_fit_cache_memoizes():
    np.random.seed(1)
    V = np.random.rand(2, 1, 30).astype(np.float32)
    params = (dict(n_atoms=2, atom_shape=(5,)), dict(n_iterations=2))
    n0 = len(_FIT_CACHE)
    m1 = fit_nmf_model(V, *params)
    m2 = fit_nmf_model(V, *params)
    assert m1 is m2 and len(_FIT_CACHE) == n0 + 1
