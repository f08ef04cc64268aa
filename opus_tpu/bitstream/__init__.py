from .range_coder import RangeEncoder, RangeDecoder, ec_tell, ec_tell_frac
from . import laplace
