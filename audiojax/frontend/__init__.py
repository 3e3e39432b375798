from . import kaldi
