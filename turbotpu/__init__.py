"""turbotpu: TPU-native 3GPP LTE/UMTS turbo decoder framework.

Public API surface (see README.md / ARCHITECTURE.md):

    from turbotpu import DecoderConfig, turbo_decode, SimConfig, simulate_ber
"""

from .decoder.turbo import DecoderConfig, turbo_decode

__version__ = "0.1.0"
__all__ = ["DecoderConfig", "turbo_decode", "SimConfig", "simulate_ber",
           "__version__"]


def __getattr__(name):
    # Lazy imports keep `import turbotpu` light (harness pulls in tx chain).
    if name in ("SimConfig", "simulate_ber"):
        from .harness import ber
        return getattr(ber, name)
    raise AttributeError(name)
