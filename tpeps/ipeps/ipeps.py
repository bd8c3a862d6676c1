"""iPEPS state classes (counterpart of reference ipeps/ipeps.py:89-541).

On-site tensor convention ``a[s, u, l, d, r]``: physical index first,
auxiliary indices up/left/down/right anti-clockwise starting from up
(reference ipeps/ipeps.py:114-123).

Design notes for the TPU rebuild:

* ``sites`` values are jnp arrays; the class itself is a light host-side
  container.  Compute functions never receive the class — they receive
  stacked arrays / pytrees extracted via :meth:`get_parameters`, keeping
  everything jit-friendly.
* JSON interchange reads and writes the reference's ``_state.json``
  formats verbatim (see :mod:`tpeps.io.tensor_io`), so committed
  peps-torch states serve as fixtures and outputs can be consumed by the
  reference.
"""

from __future__ import annotations

import json
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..io.tensor_io import (
    read_json_tensor,
    serialize_bare_tensor_legacy,
    serialize_bare_tensor_np,
)


def from_pattern(pattern):
    """Build the (x,y) -> label map from a rectangular pattern
    (reference ipeps/ipeps.py:14-83)."""
    lY, lX = len(pattern), len(pattern[0])
    site2index = {}
    for y in range(lY):
        assert len(pattern[y]) == lX, "pattern is not rectangular"
        for x in range(lX):
            site2index[(x, y)] = pattern[y][x]
    return site2index


class IPEPS:
    """Generic iPEPS over an arbitrary rectangular unit cell."""

    def __init__(self, sites=None, vertexToSite=None, pattern=None, lX=None, lY=None):
        self.sites = OrderedDict(sites) if sites else OrderedDict()
        self.dtype = next(iter(self.sites.values())).dtype if self.sites else jnp.float64
        self._pattern = pattern

        if pattern:
            self.lX, self.lY = len(pattern[0]), len(pattern)
        elif (lX is None or lY is None) and self.sites:
            xs = [c[0] for c in self.sites]
            ys = [c[1] for c in self.sites]
            self.lX = max(xs) - min(xs) + 1
            self.lY = max(ys) - min(ys) + 1
        elif lX and lY:
            self.lX, self.lY = lX, lY
        else:
            raise ValueError("lX and lY must be set directly or via sites/pattern")

        if vertexToSite is not None:
            self.vertexToSite = vertexToSite
        elif pattern:
            site2index = from_pattern(pattern)
            label2coord = {site2index[c]: c for c in self.sites}
            self.vertexToSite = lambda coord: label2coord[
                site2index[
                    (
                        (coord[0] + abs(coord[0]) * self.lX) % self.lX,
                        (coord[1] + abs(coord[1]) * self.lY) % self.lY,
                    )
                ]
            ]
        else:

            def vertexToSite(coord):
                x, y = coord
                return ((x + abs(x) * self.lX) % self.lX, (y + abs(y) * self.lY) % self.lY)

            self.vertexToSite = vertexToSite

    # ------------------------------------------------------------------ access
    def site(self, coord=(0, 0)):
        """On-site tensor at square-lattice vertex ``coord``
        (reference ipeps/ipeps.py:240-247)."""
        return self.sites[self.vertexToSite(coord)]

    def get_parameters(self):
        """Variational parameters as a pytree (dict coord -> tensor)."""
        return dict(self.sites)

    def set_parameters(self, params):
        """Functional update: return a new state with replaced tensors."""
        new = self.__class__.__new__(self.__class__)
        new.__dict__.update(self.__dict__)
        new.sites = OrderedDict((c, params[c]) for c in self.sites)
        return new

    def get_aux_bond_dims(self):
        return [d for t in self.sites.values() for d in t.shape[1:]]

    def get_checkpoint(self):
        """Data for checkpointing (reference ipeps/ipeps.py:258-266)."""
        return {c: np.asarray(t) for c, t in self.sites.items()}

    def load_checkpoint(self, checkpoint_file):
        import pickle

        with open(checkpoint_file, "rb") as f:
            checkpoint = pickle.load(f)
        params = checkpoint["parameters"]
        self.sites = OrderedDict((c, jnp.asarray(t)) for c, t in params.items())

    # ------------------------------------------------------------------ manip
    def add_noise(self, noise, key=None):
        """Add uniform noise to on-site tensors (reference ipeps/ipeps.py:292-305)."""
        if noise == 0:
            return self
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        sites = OrderedDict()
        for c, t in self.sites.items():
            key, sub = jax.random.split(key)
            if jnp.iscomplexobj(t):
                rt = jax.random.uniform(sub, t.shape + (2,), dtype=jnp.float64)
                rt = rt[..., 0] + 1j * rt[..., 1]
            else:
                rt = jax.random.uniform(sub, t.shape, dtype=t.dtype)
            sites[c] = t + noise * rt
        self.sites = sites
        return self

    def __str__(self):
        s = f"lX x lY: {self.lX} x {self.lY}\n"
        for nid, (coord, site) in enumerate(self.sites.items()):
            s += f"a{nid} {coord}: {site.shape} {site.dtype}\n"
        return s


def read_ipeps(jsonfile, vertexToSite=None, aux_seq=(0, 1, 2, 3), cls=IPEPS):
    """Read a peps-torch JSON state (reference ipeps/ipeps.py:339-441).

    ``aux_seq`` gives the order of auxiliary indices in the file relative
    to the internal [up, left, down, right] convention.
    """
    asq = [x + 1 for x in aux_seq]
    sites = OrderedDict()
    with open(jsonfile) as j:
        raw_state = json.load(j)

    if "aux_ind_seq" in raw_state:
        asq = [x + 1 for x in raw_state["aux_ind_seq"]]

    for ts in raw_state["map"]:
        coord = (ts["x"], ts["y"])
        t = None
        for s in raw_state["sites"]:
            if s["siteId"] == ts["siteId"]:
                t = s
        if t is None:
            raise KeyError(f'Tensor with siteId {ts["siteId"]} not found in "sites"')
        X = read_json_tensor(t)
        sites[coord] = jnp.asarray(X.transpose(0, *asq))

    lX = raw_state["sizeM"] if "sizeM" in raw_state else raw_state["lX"]
    lY = raw_state["sizeN"] if "sizeN" in raw_state else raw_state["lY"]
    pattern = raw_state.get("pattern") if vertexToSite is None else None
    return cls(sites, vertexToSite=vertexToSite, pattern=pattern, lX=lX, lY=lY)


def write_ipeps(state, outputfile, aux_seq=(0, 1, 2, 3), tol=1.0e-14, normalize=False, fmt="legacy"):
    """Write a state in the reference JSON format (reference ipeps/ipeps.py:467-534)."""
    asq = [x + 1 for x in aux_seq]
    json_state = {"lX": state.lX, "lY": state.lY, "sites": []}

    site_ids = []
    site_map = []
    for nid, (coord, site) in enumerate(state.sites.items()):
        site = np.asarray(site)
        if normalize:
            site = site / np.abs(site).max()
        site_ids.append(f"A{nid}")
        site_map.append({"siteId": site_ids[-1], "x": coord[0], "y": coord[1]})
        site_t = site.transpose(0, *asq)
        if fmt == "legacy":
            json_tensor = serialize_bare_tensor_legacy(site_t, tol=tol)
        else:
            json_tensor = serialize_bare_tensor_np(site_t)
        json_tensor["siteId"] = site_ids[-1]
        json_state["sites"].append(json_tensor)

    json_state["siteIds"] = site_ids
    json_state["map"] = site_map
    ucoord_to_id = {(row["x"], row["y"]): row["siteId"] for row in site_map}
    json_state["pattern"] = [
        [ucoord_to_id[state.vertexToSite((x, y))] for x in range(state.lX)]
        for y in range(state.lY)
    ]
    with open(outputfile, "w") as f:
        json.dump(json_state, f, indent=4, separators=(",", ": "))


class IPEPO(IPEPS):
    """Infinite projected entangled-pair *operator*
    (counterpart of reference ipeps/ipeps.py:764 ``IPEPO``): on-site
    tensors carry an ancilla index in addition to the physical one,
    ``a[anc, s, u, l, d, r]`` — purifications (finite temperature) and
    operator-valued layers.

    ``to_ipeps()`` fuses (anc, s) into a single d^2 physical leg so the
    whole CTMRG/RDM machinery applies to the purified state.
    """

    def site_rank(self):
        return 6

    def to_ipeps(self) -> "IPEPS":
        sites = {}
        for c, t in self.sites.items():
            sh = t.shape
            sites[c] = t.reshape(sh[0] * sh[1], *sh[2:])
        return IPEPS(sites, vertexToSite=self.vertexToSite, lX=self.lX, lY=self.lY)

    @classmethod
    def from_operator_product(cls, op, state: IPEPS) -> "IPEPO":
        """Apply a 1-site operator layer ``op[s', s]`` to an IPEPS and
        promote the original physical index to the ancilla slot."""
        sites = {c: jnp.einsum("ps,suldr->psuldr", op, t) for c, t in state.sites.items()}
        return cls(sites, vertexToSite=state.vertexToSite, lX=state.lX, lY=state.lY)


class IPEPS_WEIGHTED(IPEPS):
    """iPEPS augmented with diagonal positive bond weights — the ansatz
    structure for simple-update iTEBD (reference ipeps/ipeps.py:543-762).

    ``weights`` maps ``(coord, dxy)`` to a weight vector on the bond
    leaving ``coord`` in direction ``dxy``; ``(coord, dxy)`` and
    ``(coord+dxy, -dxy)`` index the same tensor.
    """

    _DXY_TO_AXIS = {(0, -1): 1, (-1, 0): 2, (0, 1): 3, (1, 0): 4}

    def __init__(self, state=None, sites=None, weights=None, vertexToSite=None,
                 lX=None, lY=None):
        if state is not None:
            sites = state.sites
            vertexToSite = state.vertexToSite
            lX, lY = state.lX, state.lY
        super().__init__(sites, vertexToSite=vertexToSite, lX=lX, lY=lY)
        self.weights = dict(weights) if weights else self.generate_weights()

    def generate_weights(self):
        """Identity weights on every non-equivalent bond
        (reference ipeps.py:573-600)."""
        weights = {}
        for coord in self.sites:
            for dxy, ax in self._DXY_TO_AXIS.items():
                w_id = (coord, dxy)
                w_rid = (
                    self.vertexToSite((coord[0] + dxy[0], coord[1] + dxy[1])),
                    (-dxy[0], -dxy[1]),
                )
                if w_id not in weights and w_rid not in weights:
                    W = jnp.ones(self.sites[coord].shape[ax], dtype=self.dtype)
                    weights[w_id] = W
                    weights[w_rid] = W
        return weights

    def absorb_weights(self) -> IPEPS:
        """Split weights as sqrt(W) sqrt(W) and absorb into on-site
        tensors (reference ipeps.py:616-660)."""
        sites = {}
        for coord, a in self.sites.items():
            for dxy, ax in self._DXY_TO_AXIS.items():
                w = jnp.sqrt(jnp.abs(self.weights[(coord, dxy)]))
                shape = [1] * 5
                shape[ax] = -1
                a = a * w.reshape(shape)
            sites[coord] = a
        return IPEPS(sites, vertexToSite=self.vertexToSite, lX=self.lX, lY=self.lY)

    def gauge(self, peps_cfg=None):
        """Bring the weighted iPEPS to quasi-canonical form (reference
        ipeps/ipeps.py:672-762).

        Iterates: (i) for every site/direction compute the mean-field
        bond environment ``a = A W^2 A^+`` (all other legs closed with
        squared weights), split it as ``a = X X^T`` via eigh; (ii) for
        every unique bond SVD ``X_l^T W X_r = U S Vh`` — ``S`` becomes
        the new weight and ``U^T X_l^{-1}``/``Vh X_r^{-1}`` regauge the
        adjacent site legs.  At the fixed point the weights are the
        mean-field Schmidt spectra (quasi-canonical / super-orthogonal
        form), which is the proper starting gauge for simple update and
        for truncations based on it.
        """
        tol = peps_cfg.quasi_gauge_tol if peps_cfg is not None else 1.0e-8
        max_iter = peps_cfg.quasi_gauge_max_iter if peps_cfg is not None else 10**6

        def neg(d):
            return (-d[0], -d[1])

        def add(c, d):
            return (c[0] + d[0], c[1] + d[1])

        exprs = {
            (0, -1): "suldr,smldr,l,d,r->um",
            (-1, 0): "suldr,sumdr,u,d,r->lm",
            (0, 1): "suldr,sulmr,u,l,r->dm",
            (1, 0): "suldr,suldm,u,l,d->rm",
        }
        others = {
            (0, -1): ((-1, 0), (0, 1), (1, 0)),
            (-1, 0): ((0, -1), (0, 1), (1, 0)),
            (0, 1): ((0, -1), (-1, 0), (1, 0)),
            (1, 0): ((0, -1), (-1, 0), (0, 1)),
        }

        def dl_gauge(coord, d, sites, weights):
            A = sites[coord]
            ws = [weights[(coord, o)] ** 2 for o in others[d]]
            a = jnp.einsum(exprs[d], A, jnp.conj(A), *ws)
            ev, U = jnp.linalg.eigh(-a / jnp.abs(a).max())
            ev = -ev  # descending, >= 0 up to noise
            ev = jnp.clip(ev, 0.0, None)
            X = U * jnp.sqrt(ev)
            keep = ev / ev[0] >= 1.0e-14
            inv = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, ev, 1.0)), 0.0)
            Xinv = (U * inv).conj().T
            return X, Xinv

        sites = {c: t / jnp.abs(t).max() for c, t in self.sites.items()}
        weights = dict(self.weights)
        dist = float("inf")
        it = 0
        while dist > tol and it < max_iter:
            Xs = {
                (c, d): dl_gauge(c, d, sites, weights)
                for c in sites
                for d in self._DXY_TO_AXIS
            }
            new_w, Us = {}, {}
            for c in sites:
                for d in self._DXY_TO_AXIS:
                    w_id, w_rid = (c, d), (self.vertexToSite(add(c, d)), neg(d))
                    if w_id in new_w or w_rid in new_w:
                        continue
                    M = (Xs[w_id][0].T * weights[w_id]) @ Xs[w_rid][0]
                    U, S, Vh = jnp.linalg.svd(M)
                    new_w[w_id] = S
                    new_w[w_rid] = S
                    Us[w_id] = U.T
                    Us[w_rid] = Vh
            new_s = {}
            for c in sites:
                G = [Us[(c, d)] @ Xs[(c, d)][1] for d in self._DXY_TO_AXIS]
                new_s[c] = jnp.einsum(
                    "smnop,um,ln,do,rp->suldr", sites[c], *G
                )
            dist = sum(
                float(jnp.linalg.norm(new_w[k] - weights[k])) for k in weights
            ) / len(sites)
            sites, weights = new_s, new_w
            it += 1
        return type(self)(
            sites=sites, weights=weights,
            vertexToSite=self.vertexToSite, lX=self.lX, lY=self.lY,
        )


def extend_bond_dim(state, new_d):
    """Zero-pad all auxiliary dimensions up to ``new_d``
    (reference ipeps/ipeps.py:443-466)."""
    sites = OrderedDict()
    for coord, site in state.sites.items():
        dims = site.shape
        if any(new_d < d for d in dims[1:]):
            raise ValueError("new bond dimension smaller than existing")
        pad = [(0, 0)] + [(0, new_d - d) for d in dims[1:]]
        sites[coord] = jnp.pad(site, pad)
    new_state = state.set_parameters(sites)
    new_state.sites = sites
    return new_state
