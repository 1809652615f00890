from .genotype import Genotype, init_alphas, parse_alphas  # noqa: F401
from .unet import SuperNet, DerivedNet  # noqa: F401
