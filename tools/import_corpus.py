#!/usr/bin/env python
"""CLI wrapper: WAV corpus + RTTM/JSON annotations -> native shard store.

See ``tssep_tpu.data.import_corpus`` for the full documentation.
"""
from tssep_tpu.data.import_corpus import main

if __name__ == '__main__':
    main()
