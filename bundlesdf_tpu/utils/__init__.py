from . import se3, geometry, metrics
