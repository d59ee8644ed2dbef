from moshi_tpu.tokenizer import (SPACE, SentencePieceTokenizer,
                                 TYPE_BYTE, TYPE_NORMAL, TYPE_UNKNOWN,
                                 parse_model_proto, save_model_proto)


def make_tok(extra=()):
    pieces = [("<unk>", 0.0, TYPE_UNKNOWN)]
    vocab = [SPACE + "hello", SPACE + "world", SPACE + "he", "llo",
             SPACE, "h", "e", "l", "o", "w", "r", "d",
             SPACE + "wor", "ld"]
    scores = [-1.0, -1.0, -3.0, -3.5, -5.0] + [-8.0] * 7 + [-2.0, -2.0]
    for p, s in zip(vocab, scores):
        pieces.append((p, s, TYPE_NORMAL))
    pieces.extend(extra)
    return SentencePieceTokenizer(pieces), pieces


def test_proto_roundtrip():
    _, pieces = make_tok()
    blob = save_model_proto(pieces)
    parsed = parse_model_proto(blob)
    assert parsed == [(p, s, t) for p, s, t in pieces]


def test_viterbi_picks_best_segmentation():
    tok, _ = make_tok()
    ids = tok.encode("hello")
    ps = [tok.id_to_piece(i) for i in ids]
    assert ps == [SPACE + "hello"]          # single best piece wins
    ids = tok.encode("hello world")
    ps = [tok.id_to_piece(i) for i in ids]
    assert ps[0] == SPACE + "hello"
    assert ps[1:] in ([SPACE + "world"], [SPACE + "wor", "ld"])


def test_decode_roundtrip():
    tok, _ = make_tok()
    for text in ["hello", "hello world", "world hello hello"]:
        assert tok.decode(tok.encode(text)) == text


def test_unknown_fallback():
    tok, _ = make_tok()
    ids = tok.encode("hezzz")
    assert tok.unk_id in ids               # z is unknown, no byte pieces
    # with byte fallback pieces present, bytes are used instead
    byte_pieces = [(f"<0x{b:02X}>", -20.0, TYPE_BYTE) for b in range(256)]
    tok2, _ = make_tok(extra=byte_pieces)
    ids2 = tok2.encode("hezzz")
    assert tok2.unk_id not in ids2
    assert tok2.decode(ids2) == "hezzz"


def test_empty():
    tok, _ = make_tok()
    assert tok.encode("") == []
    assert tok.decode([]) == ""


def test_streaming_tokenizer_incremental():
    from moshi_tpu.tokenizer import StreamingTextTokenizer

    class CharTok:
        def encode(self, w):
            return [100 + ord(c) % 20 for c in w]

    st = StreamingTextTokenizer(CharTok(), insert_bos=True, bos_id=1)
    st.send("hel")
    assert st.receive() == []            # incomplete word held back
    st.send("lo wor")
    out = st.receive()
    assert len(out) == 1 and out[0][1] == "hello"
    assert out[0][0][0] == 1             # BOS on first word
    st.send("ld ")
    out = st.receive()
    assert out[0][1] == "world" and out[0][0][0] != 1
    # break tag spanning chunks
    st.send('<break ti')
    assert st.receive() == []
    st.send('me="2s"/> done')
    out = st.receive()
    assert out[0][0] == [] and out[0][2] == 25   # 2s * 12.5
    out = st.flush()
    assert out[0][1] == "done"
