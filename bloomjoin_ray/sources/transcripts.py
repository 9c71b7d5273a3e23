"""Deterministic synthetic conversation-transcript generator.

Produces the BASELINE.json ``input_hint`` schema exactly:

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp[us]

Everything is counter-hashed (splitmix64 of (conv, turn, position)), NOT
RNG-state-based, so the table is a pure function of (n_convs, seed) —
independent of block boundaries, worker count and generation order. That
is what makes resume/equality tests meaningful ("per-turn text equality
under stable (conv_id, turn_idx) ordering").

Turns-per-conversation are Zipf-ish (inverse-transform Pareto, capped), so
hot conv_ids exist for the skew-handling paths; ``tool`` is heavy-hitter
skewed (geometric) for count-min tests; text length varies for
t-digest/KLL tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.keys import splitmix64

U64 = np.uint64

_VOCAB = np.array(
    ("the a of and to in is it you that he was for on are with as his they be at "
     "one have this from or had by hot word but what some we can out other were "
     "all there when up use your how said an each she which do their time if will "
     "way about many then them write would like so these her long make thing see "
     "him two has look more day could go come did number sound no most people my "
     "over know water than call first who may down side been now find any new "
     "work part take get place made live where after back little only round man "
     "year came show every good me give our under name very through just form "
     "sentence great think say help low line differ turn cause much mean before "
     "move right boy old too same tell does set three want air well also play "
     "small end put home read hand port large spell add even land here must big "
     "high such follow act why ask men change went light kind off need house "
     "picture try us again animal point mother world near build self earth "
     "father head stand own page should country found answer school grow study "
     "still learn plant cover food sun four between state keep eye never last "
     "let thought city tree cross farm hard start might story saw far sea draw "
     "left late run while press close night real life few north open seem "
     "together next white children begin got walk example ease paper group "
     "always music those both mark often letter until mile river car feet care "
     "second book carry took science eat room friend began idea fish mountain").split(),
    dtype=object,
)
_ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
_TOOLS = np.array([f"tool_{i:02d}" for i in range(20)], dtype=object)

TRANSCRIPT_SCHEMA = pa.schema([
    pa.field("conv_id", pa.string()),
    pa.field("turn_idx", pa.int32()),
    pa.field("role", pa.string()),
    pa.field("text", pa.string()),
    pa.field("tool", pa.string()),
    pa.field("ts", pa.timestamp("us")),
])

_BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
ZIPF_ALPHA = 1.5
MAX_TURNS = 512


def _h(*parts: int) -> np.ndarray:
    acc = np.uint64(0x5EED5EED5EED5EED)
    with np.errstate(over="ignore"):
        for p in parts:
            acc = splitmix64(acc ^ np.asarray(p, dtype=np.uint64))
    return acc


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> U64(11)).astype(np.float64) / float(1 << 53)


def turns_per_conv(conv_idx: np.ndarray, seed: int) -> np.ndarray:
    """Zipf-ish turn counts: 2 + Pareto(α−1), capped at MAX_TURNS."""
    u = _u01(_h(seed, 0xC0, conv_idx))
    n = 2 + np.floor((1.0 - u) ** (-1.0 / (ZIPF_ALPHA - 1.0))).astype(np.int64)
    return np.minimum(n, MAX_TURNS).astype(np.int32)


def generate_turns_table(conv_idx: np.ndarray, seed: int = 42) -> pa.Table:
    """All turns for the given conversation indices, fully vectorized."""
    conv_idx = np.asarray(conv_idx, dtype=np.int64)
    n_turns = turns_per_conv(conv_idx, seed)
    total = int(n_turns.sum())
    if total == 0:
        return TRANSCRIPT_SCHEMA.empty_table()
    conv_rep = np.repeat(conv_idx, n_turns)
    starts = np.concatenate([[0], np.cumsum(n_turns)[:-1]])
    turn_idx = (np.arange(total) - np.repeat(starts, n_turns)).astype(np.int32)

    # text: per-turn word count in [5, 80], words counter-hashed
    n_words = (5 + _h(seed, 0x7E, conv_rep, turn_idx) % U64(76)).astype(np.int64)
    total_words = int(n_words.sum())
    word_turn = np.repeat(np.arange(total), n_words)
    wstart = np.concatenate([[0], np.cumsum(n_words)[:-1]])
    word_pos = np.arange(total_words) - np.repeat(wstart, n_words)
    widx = _h(seed, 0x30, conv_rep[word_turn], turn_idx[word_turn], word_pos) % U64(len(_VOCAB))
    words = _VOCAB[widx.astype(np.int64)]
    joined = np.empty(total, dtype=object)
    bounds = np.concatenate([wstart, [total_words]])
    wl = words.tolist()
    for i in range(total):
        joined[i] = " ".join(wl[bounds[i]: bounds[i + 1]])

    # role: user/assistant alternate; tool-role turns where a tool fires
    tool_u = _u01(_h(seed, 0x70, conv_rep, turn_idx))
    has_tool = tool_u < 0.3
    # heavy-hitter-skewed tool ids (geometric)
    tool_id = np.minimum(
        np.floor(-np.log2(np.maximum(_u01(_h(seed, 0x71, conv_rep, turn_idx)), 1e-12))).astype(np.int64),
        len(_TOOLS) - 1,
    )
    tool = np.where(has_tool, _TOOLS[tool_id], None)
    role = np.where(has_tool, "tool", np.where(turn_idx % 2 == 0, "user", "assistant"))
    role = np.where(turn_idx == 0, "system", role)

    step_us = (1_000_000 + _h(seed, 0x75, conv_rep, turn_idx) % U64(30_000_000)).astype(np.int64)
    # per-conversation prefix sum (segment cumsum) so ts is a pure function
    # of (conv, turn) — monotone within a conversation, batch-independent
    cs = np.cumsum(step_us)
    before_conv = cs[starts] - step_us[starts]
    ts = _BASE_TS_US + conv_rep * (86_400_000_000 // 16) + (cs - np.repeat(before_conv, n_turns))

    return pa.table({
        "conv_id": pa.array([f"conv-{c:010d}" for c in conv_rep], type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(role.astype(object), type=pa.string()),
        "text": pa.array(joined, type=pa.string()),
        "tool": pa.array(tool.tolist(), type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def transcripts_dataset(n_convs: int, seed: int = 42, *, parallelism: int = -1,
                        convs_per_chunk: int = 2000):
    """Lazy Ray Dataset of n_convs synthetic conversations (generation
    happens inside map_batches tasks — scales to any size).

    Each task yields bounded chunks (``convs_per_chunk`` conversations,
    ~100k turns) so per-task memory stays flat however large a block of
    conv ids it receives."""
    import ray.data as rd

    if parallelism <= 0:
        parallelism = max(16, n_convs // 20_000)
    base = rd.range(n_convs, override_num_blocks=parallelism)

    def gen(batch: pa.Table):
        ids = np.asarray(batch.column("id"))
        for i in range(0, len(ids), convs_per_chunk):
            yield generate_turns_table(ids[i: i + convs_per_chunk], seed)

    return base.map_batches(gen, batch_format="pyarrow")


def write_transcripts(out_dir: str, n_convs: int, seed: int = 42, *,
                      parallelism: int = -1) -> str:
    ds = transcripts_dataset(n_convs, seed, parallelism=parallelism)
    ds.write_parquet(out_dir)
    return out_dir
