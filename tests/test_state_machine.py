from moshi_tpu.models.state_machine import (Entry, StateMachine, TokenIds,
                                            script_to_entries)


class FakeTokenizer:
    def encode(self, word):
        # one token per char, offset to avoid special ids
        return [10 + (ord(c) % 50) for c in word]


def test_initial_padding_forces_pads():
    sm = StateMachine(text_card=8001, max_padding=8, initial_padding=2)
    st = sm.new_state([Entry([42, 43], "hi", padding=0)])
    ids = sm.token_ids
    # first two steps are forced padding regardless of model output
    assert sm.process(0, st, ids.new_word) == ids.pad
    assert sm.process(1, st, ids.new_word) == ids.pad


def test_word_consumption_and_queue():
    sm = StateMachine(text_card=8001, max_padding=8, initial_padding=0)
    st = sm.new_state([Entry([42, 43, 44], "abc", padding=0)])
    ids = sm.token_ids
    out = sm.process(0, st, ids.new_word)
    assert out == ids.new_word          # word announced
    # queued tokens force pads and are fed one per step
    assert sm.process(1, st, ids.new_word) == 42
    assert sm.process(2, st, ids.pad) == 43
    assert sm.process(3, st, ids.pad) == 44
    assert sm.process(4, st, ids.pad) == ids.pad


def test_max_padding_forces_new_word():
    sm = StateMachine(text_card=8001, max_padding=2, initial_padding=0)
    st = sm.new_state([Entry([7], "a", 0), Entry([8], "b", 0)])
    ids = sm.token_ids
    assert sm.process(0, st, ids.new_word) == ids.new_word
    # feeding the queued token counts against the padding budget too
    assert sm.process(1, st, ids.pad) == 7
    assert sm.process(2, st, ids.pad) == ids.pad
    out = sm.process(3, st, ids.pad)    # remaining_padding exhausted
    assert out == ids.new_word


def test_end_step_set_when_empty():
    sm = StateMachine(text_card=8001, max_padding=2, initial_padding=0)
    st = sm.new_state([])
    ids = sm.token_ids
    for step in range(4):
        sm.process(step, st, ids.new_word)
    assert st.end_step == 0
    assert st.is_empty()


def test_forced_padding_from_entry():
    sm = StateMachine(text_card=8001, max_padding=8, initial_padding=0)
    st = sm.new_state([Entry([5], "a", padding=3), Entry([6], "b", 0)])
    ids = sm.token_ids
    assert sm.process(0, st, ids.new_word) == ids.new_word
    assert sm.process(1, st, ids.new_word) == 5   # queued forces pad path
    # forced_padding=3 consumed over next steps -> next word delayed
    outs = [sm.process(2 + i, st, ids.new_word) for i in range(3)]
    assert outs[0] == ids.pad and outs[1] == ids.pad
    assert outs[2] == ids.new_word   # forced padding exhausted after 2 pads


def test_second_stream_ahead_muxing():
    card = 101
    sm = StateMachine(text_card=card, second_stream_ahead=1,
                      max_padding=8, initial_padding=0)
    st = sm.new_state([Entry([40], "a", 0), Entry([50], "b", 0)])
    ids = sm.token_ids
    out = sm.process(0, st, ids.new_word)
    # new word: second = new_word(0), output = first queued token (40)
    assert out == (0 + 1) * card + 40
    # lookahead stream fed the next word's token (50)
    out = sm.process(1, st, ids.pad)
    second, first = out // card - 1, out % card
    assert second == 50 or first == ids.pad  # lookahead consumed


def test_script_to_entries_speakers_and_breaks():
    ids = TokenIds()
    entries = script_to_entries(FakeTokenizer(), ids, 12.5,
                                ['hello world', 'reply here'],
                                multi_speaker=True, padding_between=1)
    # first word of line 0 gets main speaker token prepended
    assert entries[0].tokens[0] == ids.main
    # first word of line 1 gets other speaker token
    line1_first = [e for e in entries if e.text == "reply"][0]
    assert line1_first.tokens[0] == ids.other
    # padding_between=1 -> padding = 1 + len(tokens) - 1
    assert entries[1].padding == 1 + len(entries[1].tokens) - 1

    entries2 = script_to_entries(FakeTokenizer(), ids, 12.5,
                                 ['hi <break time="2s"/> there'])
    br = [e for e in entries2 if not e.tokens]
    assert len(br) == 1 and br[0].padding == 25  # 2s * 12.5
