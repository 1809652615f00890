from .bilevel import SearchState, Searcher, make_search_step, make_warmup_step  # noqa: F401
