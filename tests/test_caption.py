"""pre_caption parity vs the reference regexes (golden strings)."""

from multimodal_dataset_distillation_tpu.data.caption import pre_caption, pre_question


def test_punctuation_spaced_and_collapsed():
    assert pre_caption('A man (left) says: "Hi!"') == "a man left says hi"


def test_lowercase_strip():
    assert pre_caption("  Hello World.\n") == "hello world"


def test_truncation():
    cap = " ".join(str(i) for i in range(50))
    out = pre_caption(cap, max_words=30)
    assert out == " ".join(str(i) for i in range(30))


def test_tilde_and_hash():
    assert pre_caption("a~b#c") == "a b c"


def test_untouched_punct_kept():
    # only [.!"()*#:;~] are replaced — comma, question mark, dash stay
    assert pre_caption("red, blue? high-contrast") == "red, blue? high-contrast"


def test_pre_question_removes_punct():
    assert pre_question('What is "this"?') == "what is this?"
