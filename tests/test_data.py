"""Data layer: conversation templates, modal tokenization, image processing
(reference: modelcompose/conversation.py, mm_utils.py)."""

import numpy as np
import pytest
from PIL import Image

from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
from modelcompose_tpu.data.conversation import SeparatorStyle, conv_templates
from modelcompose_tpu.data.image_processing import (ClipImageProcessor,
                                                    expand2square,
                                                    process_images)
from modelcompose_tpu.data.tokenization import (get_model_name_from_path,
                                                split_string_by_list,
                                                tokenizer_modal_token)


class FakeTokenizer:
    """Word-level fake with a BOS, mimicking sentencepiece's prepend."""
    bos_token_id = 1

    def __call__(self, text):
        class R:
            pass
        r = R()
        ids = [1] + [100 + len(w) for w in text.split()]
        r.input_ids = ids
        return r


def test_vicuna_v1_prompt_format():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "<image>\nWhat is this?")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.startswith("A chat between a curious user")
    assert p.endswith("USER: <image>\nWhat is this? ASSISTANT:")


def test_plain_prompt_format():
    conv = conv_templates["plain"].copy()
    conv.append_message(conv.roles[0], "<image>caption")
    conv.append_message(conv.roles[1], "a dog")
    assert conv.get_prompt() == "<image>caption\na dog</s>" \
        if conv.sep2 else True
    # plain template: sep='\n', sep2=None -> seps alternate ['\n', None]


def test_llama2_prompt_format():
    conv = conv_templates["llama_2"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], "hello")
    p = conv.get_prompt()
    assert "[INST]" in p and "<<SYS>>" in p and p.endswith("hello </s>")


def test_split_string_by_list():
    parts = split_string_by_list("a<image>b<audio>c", ["<image>", "<audio>"])
    assert parts == [("a", "<image>"), ("b", "<audio>"), ("c", None)]


def test_tokenizer_modal_token_bos_dedup():
    tok = FakeTokenizer()
    ids = tokenizer_modal_token("ab cd<image>ef", tok)
    # chunks: "ab cd" -> [1, 102, 102]; "ef" -> [1, 102]
    # BOS kept once, chunk BOS stripped, <image> -> -200
    assert ids == [1, 102, 102, MODAL_TOKEN_INDEXES["vision"], 102]


def test_tokenizer_modal_token_multi_modal():
    tok = FakeTokenizer()
    ids = tokenizer_modal_token("x<audio>y<point>z", tok,
                                return_tensors="np")
    assert list(ids) == [1, 101, MODAL_TOKEN_INDEXES["audio"], 101,
                         MODAL_TOKEN_INDEXES["point"], 101]


def test_get_model_name_from_path():
    assert get_model_name_from_path("/a/b/multimodal-vicuna") == \
        "multimodal-vicuna"
    assert get_model_name_from_path("/a/mm/checkpoint-100") == \
        "mm_checkpoint-100"


def test_clip_image_processor_shapes():
    proc = ClipImageProcessor(size=28)
    img = Image.fromarray(np.zeros((60, 40, 3), np.uint8))
    out = proc(img)
    assert out.shape == (1, 28, 28, 3)
    # black pixels map to (0 - mean)/std
    np.testing.assert_allclose(
        out[0, 0, 0], (0 - np.array(proc.image_mean)) / np.array(proc.image_std),
        rtol=1e-5)


def test_expand2square():
    img = Image.fromarray(np.full((10, 20, 3), 7, np.uint8))
    sq = expand2square(img, (1, 2, 3))
    assert sq.size == (20, 20)
    arr = np.asarray(sq)
    assert (arr[0] == [1, 2, 3]).all()  # top padding row
    assert (arr[7] == 7).all()          # original content centered


def test_process_images_pad_mode():
    proc = ClipImageProcessor(size=28)
    img = Image.fromarray(np.zeros((60, 40, 3), np.uint8))
    out = process_images([img], proc, image_aspect_ratio="pad")
    assert out.shape == (1, 28, 28, 3)


def test_clip_processor_matches_hf():
    """Our host preprocessing vs transformers' CLIPImageProcessor."""
    from transformers import CLIPImageProcessor as HFProc
    hf = HFProc(size={"shortest_edge": 28}, crop_size={"height": 28,
                                                       "width": 28},
                do_resize=True, do_center_crop=True, do_rescale=True,
                do_normalize=True,
                image_mean=list(ClipImageProcessor().image_mean),
                image_std=list(ClipImageProcessor().image_std))
    ours = ClipImageProcessor(size=28)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(40, 56, 3) * 255).astype(np.uint8))
    want = hf(img, return_tensors="np")["pixel_values"][0]  # [3, H, W]
    got = ours([img])[0].transpose(2, 0, 1)                 # NHWC -> CHW
    np.testing.assert_allclose(got, want, atol=2e-2)
    # a size where truncation vs rounding differ (28*64/41 = 43.7: HF's
    # int() gives 43, round() gave 44 and shifted the center crop)
    img2 = Image.fromarray(
        (np.random.RandomState(1).rand(41, 64, 3) * 255).astype(np.uint8))
    want2 = hf(img2, return_tensors="np")["pixel_values"][0]
    got2 = ours([img2])[0].transpose(2, 0, 1)
    np.testing.assert_allclose(got2, want2, atol=2e-2)


def test_process_images_matches_reference(tmp_path):
    """expand2square pad path vs the reference's mm_utils.process_images."""
    from tests.reference_oracle import reference_available
    if not reference_available():
        import pytest
        pytest.skip("/root/reference not mounted")
    from tests.reference_oracle import load_reference_arch
    load_reference_arch()
    import modelcompose.mm_utils as ref_mm

    class HFLikeProc:
        image_mean = list(ClipImageProcessor().image_mean)

        def preprocess(self, image, return_tensors=None):
            arr = ClipImageProcessor(size=28)([image])[0]  # HWC
            import torch
            return {"pixel_values":
                    [torch.from_numpy(arr.transpose(2, 0, 1))]}

    class Cfg:
        image_aspect_ratio = "pad"

    img = Image.fromarray(
        (np.random.RandomState(1).rand(30, 50, 3) * 255).astype(np.uint8))
    theirs = ref_mm.process_images([img], HFLikeProc(), Cfg())[0].numpy()
    ours = process_images([img], ClipImageProcessor(size=28),
                          image_aspect_ratio="pad")[0].transpose(2, 0, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_video_collate_mixed_frame_counts():
    """A batch mixing single-frame .jpg 'videos' with real 8-frame clips
    tiles the 1-frame entries to the batch max, mirroring the reference's
    expand-then-stack (multimodal_dataset.py:203-210)."""
    from modelcompose_tpu.data.dataset import DataCollatorForSupervisedDataset
    coll = DataCollatorForSupervisedDataset(
        tokenizer=None, modal_processors={"video": lambda p: p})
    jpg_clip = np.arange(1 * 1 * 2 * 2 * 3, dtype=np.float32).reshape(
        1, 1, 2, 2, 3)
    vid_clip = np.ones((1, 8, 2, 2, 3), np.float32)
    out = coll.process_modal_inputs({"video": [jpg_clip, vid_clip]})
    assert out["video"].shape == (2, 8, 2, 2, 3)
    for t in range(8):  # tiled frames are identical
        np.testing.assert_array_equal(out["video"][0, t], jpg_clip[0, 0])
    np.testing.assert_array_equal(out["video"][1], vid_clip[0])


def test_split_list_pads_to_n_chunks():
    """Ceil-chunking can yield fewer than n chunks (len 10 / n 8 -> 5);
    every chunk_idx < n must stay valid for distributed eval launchers."""
    from modelcompose_tpu.data.dataset import get_chunk, split_list
    chunks = split_list(list(range(10)), 8)
    assert len(chunks) == 8
    assert sum(chunks, []) == list(range(10))
    assert chunks[:5] == [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]]
    assert chunks[5:] == [[], [], []]
    assert get_chunk(list(range(10)), 8, 7) == []
    assert split_list([], 4) == [[], [], [], []]
    # even split unchanged vs the reference arithmetic
    assert split_list(list(range(8)), 4) == [[0, 1], [2, 3], [4, 5], [6, 7]]


def test_convert_record_does_not_mutate_input():
    """convert_record must not rewrite the caller's conversation dicts in
    place (shallow-copy aliasing, round-5 review finding)."""
    from modelcompose_tpu.data.convert_to_multimodal import convert_record
    rec = {"id": 1, "audio": "x.wav",
           "conversations": [{"from": "human", "value": "<image>\nq"}]}
    out = convert_record(rec, "audio")
    assert out["conversations"][0]["value"].startswith("<audio>")
    assert rec["conversations"][0]["value"].startswith("<image>")


def test_plain_prompt_second_turn_no_crash():
    """conv_llava_plain has sep2=None; rendering a completed exchange must
    not TypeError (the reference crashes at conversation.py:91-97)."""
    conv = conv_templates["plain"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "<image>")
    conv.append_message(conv.roles[1], "a red bus")
    assert conv.get_prompt() == "<image>\na red bus"


def test_split_string_by_list_equivalence():
    """Linear endswith scan is behavior-identical to the reference's
    quadratic substring scan (mm_utils.py:65-80)."""
    import random

    def reference_impl(text, separators):
        splits, current = [], ""
        for char in text:
            current += char
            hit = next((s for s in separators if s in current), None)
            if hit is not None:
                chunk, _ = current.split(hit, 1)
                splits.append((chunk, hit))
                current = ""
        if current:
            splits.append((current, None))
        return splits

    seps = ["<image>", "<audio>", "<video>"]
    rng = random.Random(0)
    pieces = ["hi ", "<image>", "<aud", "io>", "x<video>", "<im", "age>",
              " tail", "<", ">"]
    for _ in range(50):
        text = "".join(rng.choice(pieces)
                       for _ in range(rng.randint(0, 12)))
        assert split_string_by_list(text, seps) == \
            reference_impl(text, seps), text


def test_load_audio_8bit_unsigned_midpoint(tmp_path):
    """8-bit PCM is unsigned; a constant-128 file must decode to silence,
    not a +1.0 DC bias."""
    import wave

    from modelcompose_tpu.data.audio_processing import BeatsAudioProcessor
    path = tmp_path / "a8.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(16000)
        w.writeframes(bytes([128] * 16000))
    proc = BeatsAudioProcessor()
    arr = proc._load_audio(str(path))
    np.testing.assert_allclose(arr, 0.0, atol=1e-6)
