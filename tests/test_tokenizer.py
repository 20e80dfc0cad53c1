"""Tokenizer tests: greedy bigram merge semantics, byte fallback, specials."""

from minigpt4_tpu.tokenizer import TOKEN_BOS, TOKEN_EOS, LlamaTokenizer


def make_tok(extra, scores=None):
    base = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)]
    toks = base + extra
    sc = [0.0] * len(base) + (scores or [0.0] * len(extra))
    return LlamaTokenizer(toks, sc)


def test_bos_prepended():
    t = make_tok([])
    assert t.tokenize("", add_bos=True) == [TOKEN_BOS]
    assert t.tokenize("", add_bos=False) == []


def test_single_chars():
    t = make_tok([])
    ids = t.tokenize("ab", add_bos=False)
    # 'a'=97 -> id 97+3=100 via the single-byte vocab entries
    assert ids == [ord("a") + 3, ord("b") + 3]


def test_greedy_merge_prefers_higher_score():
    # vocab has "ab" (score 2) and "bc" (score 1): "abc" -> ["ab", "c"]
    t = make_tok([b"ab", b"bc"], scores=[2.0, 1.0])
    ids = t.tokenize("abc", add_bos=False)
    assert [t.id_to_bytes(i) for i in ids] == [b"ab", b"c"]
    # flip scores: "bc" wins
    t = make_tok([b"ab", b"bc"], scores=[1.0, 2.0])
    ids = t.tokenize("abc", add_bos=False)
    assert [t.id_to_bytes(i) for i in ids] == [b"a", b"bc"]


def test_cascading_merges():
    t = make_tok([b"ab", b"cd", b"abcd"], scores=[1.0, 1.0, 5.0])
    ids = t.tokenize("abcd", add_bos=False)
    assert [t.id_to_bytes(i) for i in ids] == [b"abcd"]


def test_space_prefix_tokens():
    # llama.cpp vocabs store sentencepiece pieces with "▁" -> " ".  A long
    # token is only reachable through intermediate bigram merges, exactly as
    # in llama.cpp (real vocabs contain the intermediates).
    pieces = [b" H", b" He", b" Hel", b" Hell", b" Hello", b"el", b"ell", b"lo"]
    scores = [1.0, 2.0, 3.0, 4.0, 5.0, 0.5, 0.6, 0.7]
    t = make_tok(pieces, scores=scores)
    ids = t.tokenize(" Hello world", add_bos=False)
    texts = [t.id_to_bytes(i) for i in ids]
    assert texts[0] == b" Hello"
    assert b"".join(texts) == b" Hello world"


def test_byte_fallback_for_non_vocab_utf8():
    # tokenizer without byte entries: unknown chars fall back to byte+3 ids
    t = LlamaTokenizer([b"<unk>", b"<s>", b"</s>", b"hi"], [0.0] * 4)
    ids = t.tokenize("hi\xe9", add_bos=False)  # é = 0xC3 0xA9 in UTF-8
    assert ids == [3, 0xC3 + 3, 0xA9 + 3]


def test_eos_maps_to_string():
    t = make_tok([])
    assert t.id_to_str(TOKEN_EOS) == "</s>"


def test_detokenize_concat():
    t = make_tok([b" Hel", b"lo"], scores=[1.0, 1.0])
    ids = t.tokenize(" Hello", add_bos=False)
    assert t.detokenize(ids) == " Hello"
