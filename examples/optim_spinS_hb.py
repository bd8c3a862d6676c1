"""Ground-state optimization of the spin-S bilinear-biquadratic
Heisenberg model (counterpart of reference examples/optim_spinS_hb.py):

    python examples/optim_spinS_hb.py --spinS 3 --bond_dim 3 --chi 27 \\
        --tiling BIPARTITE

--spinS is the SU(2) irrep DIMENSION (2S+1): 2 = spin-1/2, 3 = spin-1...
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import tpeps  # noqa: F401

from optim_common import optimize_generic, state_from_args  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models import hb

parser = get_args_parser()
parser.add_argument("--spinS", type=int, default=2,
                    help="su(2) irrep dimension (2S+1)")
parser.add_argument("--j1", type=float, default=1.0,
                    help="NN bilinear coupling")
parser.add_argument("--k1", type=float, default=0.0,
                    help="NN biquadratic coupling")
parser.add_argument("--tiling", default="BIPARTITE",
                    choices=["BIPARTITE", "2SITE", "4SITE", "8SITE"])
args, unknown_args = parser.parse_known_args()


def tiling_spec(tiling):
    """(coords, vertexToSite, lX, lY) per tiling (reference
    examples/optim_spinS_hb.py:34-57)."""
    if tiling == "BIPARTITE":
        return ([(0, 0), (1, 0)],
                lambda c: ((c[0] + c[1]) % 2, 0), 2, 1)
    if tiling == "2SITE":
        return ([(0, 0), (1, 0)], lambda c: (c[0] % 2, 0), 2, 1)
    if tiling == "4SITE":
        return ([(x, y) for x in range(2) for y in range(2)],
                lambda c: (c[0] % 2, c[1] % 2), 2, 2)
    # 8SITE
    return ([(x, y) for x in range(4) for y in range(2)],
            lambda c: ((c[0] + 2 * (c[1] // 2)) % 4, c[1] % 2), 4, 2)


def main():
    cfg = configure(args)
    model = hb.HB(spin_s=args.spinS, j1=args.j1, k1=args.k1,
                  dtype=cfg.global_args.jnp_dtype)
    coords, v2s, lX, lY = tiling_spec(args.tiling)
    energy_f = (model.energy_2x2_4site if args.tiling in ("4SITE", "8SITE")
                else model.energy_2x1_1x2)
    sites0 = state_from_args(cfg, coords, args.spinS, vertexToSite=v2s)
    e, *_ = optimize_generic(
        cfg, energy_f, sites0, vertexToSite=v2s, lX=lX, lY=lY,
        obs_f=model.eval_obs,
    )
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptSpinSHB(unittest.TestCase):
    """Spin-1 (spinS=3) bipartite HAFM: a short D=2 optimization must
    pass below the Neel product-state bound (-2 per bond pair => per
    site -1 at S=1 classical: <S.S>=-S^2=-1 per bond, 2 bonds per site
    => e < -1 already classically; demand e < -1.5 after a few steps)."""

    def test_opt_spin1_bipartite(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.spinS = 3
        args.j1, args.k1 = 1.0, 0.0
        args.tiling = "BIPARTITE"
        args.bond_dim = 2
        args.chi = 8
        args.seed = 1
        args.opt_max_iter = 8
        args.out_prefix = "/tmp/RESULT_spins_hb_test"
        args.CTMARGS_ctm_max_iter = 30
        e = main()
        assert e < -1.5, e
