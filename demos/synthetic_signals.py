"""Shift-invariant decomposition of synthetic 1-D / 2-D signals."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tnmf_tpu.utils.demo import SignalTool, fit_nmf_model, st_define_nmf_params  # noqa: E402


def main(progress_bar=None, n_dims: int = 2, verbose: bool = True):
    tool = SignalTool(n_dims=n_dims)
    V, opt_nmf_params = tool.st_generate_input(verbose=verbose)

    nmf_params, fit_params = st_define_nmf_params(opt_nmf_params, verbose=verbose)
    nmf = fit_nmf_model(V, nmf_params, fit_params, progress_bar)

    tool.st_compare_signals(V, nmf.R, verbose=verbose)
    tool.st_compare_individual_signals(V, nmf.R, verbose=verbose)
    tool.st_plot_partial_reconstructions(V, nmf, verbose=verbose)


if __name__ == '__main__':
    main()
