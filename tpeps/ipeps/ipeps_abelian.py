"""Abelian-symmetric iPEPS (counterpart of reference ipeps/ipeps_abelian.py:37-326).

Holds :class:`tpeps.sym.tensor.AbelianTensor` on-site tensors in the same
``a[s,u,l,d,r]`` convention as the dense :class:`~tpeps.ipeps.ipeps.IPEPS`.
The reference builds on YASTN; here the block-sparse core is
:mod:`tpeps.sym.tensor` — charge structure is static metadata, blocks are
jnp arrays, so contractions trace and jit.

Reference signature convention (ipeps/ipeps_abelian.py:61-66): physical
leg +1, aux legs (u,l) +1 and (d,r) -1, so that neighbouring tensors
contract ket-to-ket along bonds with opposite signatures.
"""

from __future__ import annotations

from collections import OrderedDict

from ..sym.tensor import AbelianTensor
from .ipeps import IPEPS

_SIG = (1, 1, 1, -1, -1)  # (s, u, l, d, r)


class IPEPS_ABELIAN:
    """iPEPS over an arbitrary unit cell with abelian-symmetric tensors."""

    def __init__(self, sym, sites, vertexToSite=None, lX=None, lY=None):
        self.sym = sym
        self.sites = OrderedDict(sites)
        for t in self.sites.values():
            assert isinstance(t, AbelianTensor) and t.ndim == 5
        if lX is None or lY is None:
            xs = [c[0] for c in self.sites]
            ys = [c[1] for c in self.sites]
            lX = max(xs) - min(xs) + 1
            lY = max(ys) - min(ys) + 1
        self.lX, self.lY = lX, lY
        if vertexToSite is not None:
            self.vertexToSite = vertexToSite
        else:

            def vertexToSite(coord):
                x, y = coord
                return ((x + abs(x) * self.lX) % self.lX, (y + abs(y) * self.lY) % self.lY)

            self.vertexToSite = vertexToSite

    def site(self, coord=(0, 0)):
        return self.sites[self.vertexToSite(coord)]

    def get_parameters(self):
        """Variational parameters: dict coord -> block dict (a pytree;
        the charge metadata stays static, mirroring the reference's
        static-metadata/dynamic-data checkpoint split,
        ipeps/ipeps_abelian.py:131-146)."""
        return {c: t.blocks for c, t in self.sites.items()}

    def set_parameters(self, params):
        new_sites = OrderedDict(
            (c, t.copy_with(params[c])) for c, t in self.sites.items()
        )
        return IPEPS_ABELIAN(self.sym, new_sites, self.vertexToSite, self.lX, self.lY)

    def to_dense(self) -> IPEPS:
        """Embed into a dense :class:`IPEPS` (ipeps_abelian.py:257-276) —
        the bridge that lets every dense CTMRG/RDM/model routine act as
        the oracle for the symmetric stack."""
        sites = OrderedDict((c, t.to_dense()) for c, t in self.sites.items())
        return IPEPS(sites, vertexToSite=self.vertexToSite, lX=self.lX, lY=self.lY)

    def __str__(self):
        s = f"IPEPS_ABELIAN[{self.sym}] lX x lY: {self.lX} x {self.lY}\n"
        for coord, t in self.sites.items():
            s += f"  {coord}: legs {[l.total_dim() for l in t.legs]} blocks {len(t.blocks)}\n"
        return s


def make_staggered_signature_site(key, sym, phys_leg, aux_leg, n=0):
    """Random symmetric on-site tensor with the canonical signature."""
    import jax

    return AbelianTensor.random(
        key, sym, _SIG, (phys_leg, aux_leg, aux_leg, aux_leg, aux_leg), n
    )


def make_c4v_symm_A1_abelian(a: AbelianTensor) -> AbelianTensor:
    """Project a 1-site abelian tensor ``a[s,u,l,d,r]`` (uniform aux leg
    tables) onto the A1 irrep of C4v — the same reflection/rotation
    average as the dense :func:`tpeps.ipeps.ipeps_c4v.symmetrize_c4v`
    (reference groups/pg_abelian.py:109-130 ``make_c4v_symm_A1``).
    Fully traceable; used inside abelian loss functions."""
    a = 0.5 * (a + a.transpose((0, 1, 4, 3, 2)))  # left-right reflection
    a = 0.5 * (a + a.transpose((0, 3, 2, 1, 4)))  # up-down reflection
    a = 0.5 * (a + a.transpose((0, 4, 1, 2, 3)))  # pi/2 anti-clockwise
    a = 0.5 * (a + a.transpose((0, 2, 3, 4, 1)))  # pi/2 clockwise
    return a


def add_noise_abelian(a: AbelianTensor, key, noise: float) -> AbelianTensor:
    """``a + noise * r`` with ``r`` uniform in [-0.5, 0.5) on every
    existing block (reference ipeps/ipeps_abelian_c4v.py:124-145
    ``add_noise`` — noise lands on all blocks of the on-site tensor)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if noise == 0:
        return a
    blocks = {}
    for q in sorted(a.blocks):
        b = a.blocks[q]
        key, sub = jax.random.split(key)
        r = jax.random.uniform(sub, b.shape, dtype=jnp.float64, minval=-0.5,
                               maxval=0.5)
        blocks[q] = b + noise * (np.asarray(r) if isinstance(b, np.ndarray) else r)
    return a.copy_with(blocks)
