"""audiojax — TPU-native speech-enhancement inference stack.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DakeQQ/Audio-Denoiser-ONNX (reference mounted read-only at /root/reference):
denoising, echo cancellation, speech/vocal separation and super-resolution
models behind a single contract — int16 PCM in, int16 PCM out, with the
STFT/ISTFT front-/back-ends fused into the compiled graph.

Subpackages
-----------
dsp       STFT/ISTFT (matmul-DFT + static overlap-add), windows
frontend  Kaldi fbank, mel banks, deltas, resamplers, FIR crossover
nn        shared blocks: scan RNNs, FSMN, attention families, ERB, …
models    the 14 model definitions
importers torch-checkpoint → fused JAX pytree importers
runtime   manifests, window slicing/stitching sessions, CLI, audio I/O
parallel  mesh/sharding helpers for multi-chip serving
ops       Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"
