from seld_tpu.data.audio import load_wav  # noqa: F401
from seld_tpu.data.discovery import discover_files  # noqa: F401
from seld_tpu.data.corpus import WindowedCorpus, build_corpus  # noqa: F401
from seld_tpu.data.cache import cached_build_corpus  # noqa: F401
from seld_tpu.data.sampler import BatchIterator  # noqa: F401
from seld_tpu.data.synthetic import synthetic_corpus, synthetic_raw_files  # noqa: F401
