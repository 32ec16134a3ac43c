"""Lucene-parity analysis chain, vectorized.

Reference semantics (file:line cites are into /root/reference):

* tokenizer  — src/analyses/StandardTokenizer.php (UAX#29 word break)
* wdgf       — src/analyses/WordDelimiterGraphFilter.php + WordDelimiterIterator.php
* filters    — src/analyses/LowerCaseFilter.php, StopFilter.php,
               FilteringTokenFilter.php (pos_inc accumulation on drop)
* porter2    — the Snowball English stemmer named by the north star
               (the reference pulls it from the non-vendored php-tartarus dep)
* chain      — the fused pipeline + pandas_udf factories
"""

from .chain import analyze, analyze_udf, term_vectors_udf  # noqa: F401
from .tokenizer import Token, standard_tokenize  # noqa: F401
