from lucene_spark.search.ast import (  # noqa: F401
    Occur,
    TermQuery,
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    WildcardQuery,
    RegexpQuery,
    FuzzyQuery,
    TermInSetQuery,
    SynonymQuery,
    DisjunctionMaxQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    rewrite,
)
from lucene_spark.search.similarity import BM25Stats  # noqa: F401
from lucene_spark.search.parser import parse_query  # noqa: F401
