"""TensorBoard event-file writer (SURVEY.md §5.5 observability tier).

The writer hand-encodes the TFRecord framing + Event protobuf; these
tests verify the format end-to-end with the module's independent reader
(CRC-checked) and pin known-good CRC values so the implementation can't
drift silently.
"""

import struct

from pwstablenet_tpu.utils.tb_writer import (
    SummaryWriter,
    crc32c,
    masked_crc32c,
    read_event_file,
)


def test_crc32c_known_vectors():
    # RFC 3720 Castagnoli test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_masked_crc_roundtrip():
    # masking must match TFRecord's ((crc>>15)|(crc<<17)) + 0xa282ead8
    data = b"length-header"
    crc = crc32c(data)
    expected = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(data) == expected


def test_write_and_read_scalars(tmp_path):
    w = SummaryWriter(str(tmp_path / "run1"))
    w.add_scalar("loss_g", 0.5, step=1, wall_time=123.0)
    w.add_scalars({"loss_d": 0.25, "fps": 100.0}, step=2, wall_time=124.0)
    w.close()

    events = read_event_file(w.path)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 1
    assert events[1]["scalars"] == {"loss_g": 0.5}
    assert events[1]["wall_time"] == 123.0
    by_tag = {}
    for ev in events[2:]:
        assert ev["step"] == 2
        by_tag.update(ev["scalars"])
    assert by_tag == {"loss_d": 0.25, "fps": 100.0}


def test_crc_detects_corruption(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("x", 1.0, step=0)
    w.close()
    raw = bytearray(open(w.path, "rb").read())
    raw[-6] ^= 0xFF  # flip a payload byte of the last record
    open(w.path, "wb").write(bytes(raw))
    try:
        read_event_file(w.path)
        assert False, "corruption not detected"
    except ValueError:
        pass


def test_record_framing_layout(tmp_path):
    """First record must be the file_version event in TFRecord framing."""
    w = SummaryWriter(str(tmp_path))
    w.close()
    raw = open(w.path, "rb").read()
    (length,) = struct.unpack("<Q", raw[:8])
    payload = raw[12 : 12 + length]
    assert b"brain.Event:2" in payload
    (hcrc,) = struct.unpack("<I", raw[8:12])
    assert hcrc == masked_crc32c(raw[:8])


def test_train_loop_writes_tb_events(tmp_path):
    """TrainConfig.tb_log_dir wires the writer into the train loop."""
    from pwstablenet_tpu.config import ModelConfig, TrainConfig
    from pwstablenet_tpu.train.loop import synthetic_batch_iterator, train

    tiny = ModelConfig(
        temporal_window=3,
        num_levels=4,
        base_features=8,
        max_features=16,
        model_resolution=(32, 32),
        num_stages=1,
        disc_num_layers=2,
        feat_channels=(8, 16),
        compute_dtype="float32",
    )
    logdir = str(tmp_path / "tb")
    train_cfg = TrainConfig(
        batch_size=2,
        log_every=2,
        checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tb_log_dir=logdir,
        stage_weights=(1.0,),
    )
    train(
        tiny,
        train_cfg,
        synthetic_batch_iterator(tiny, train_cfg),
        max_steps=2,
    )
    import glob

    files = glob.glob(logdir + "/events.out.tfevents.*")
    assert len(files) == 1
    events = read_event_file(files[0])
    scalar_events = [e for e in events if "scalars" in e]
    assert scalar_events, "no scalar events written"
    tags = set()
    for e in scalar_events:
        assert e["step"] == 2
        tags.update(e["scalars"])
    assert {"loss_g", "loss_d"} <= tags
