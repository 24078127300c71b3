"""jammy_flows_tpu: TPU-native normalizing flows over products of manifolds.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of
thoglu/jammy_flows (reference mounted at /root/reference), extended with a
sharded probabilistic-inference engine (HMC/NUTS, SVI, SMC).

Main entry points:
    pdf                 - joint autoregressive manifold PDF (two-string DSL)
    fully_amortized_pdf - one outer MLP predicts ALL parameters of an inner pdf
"""
from .models.pdf import PDF, pdf
from .models.fully_amortized import FullyAmortizedPDF, fully_amortized_pdf

__version__ = "0.1.0"

__all__ = ["PDF", "pdf", "FullyAmortizedPDF", "fully_amortized_pdf"]
