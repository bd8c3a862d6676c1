from .eigh import eigh_desc, truncated_eigh_sym, multiplet_mask
from .svd import svd_reg, truncated_svd, rsvd
