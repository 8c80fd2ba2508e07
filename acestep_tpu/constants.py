"""Shared constants (prompt/instruction strings, task vocab, model limits).

The instruction strings are checkpoint-compatibility DATA — the LM planners were
fine-tuned on these exact prompts (reference acestep/constants.py:100-170), so
they must match byte-for-byte for the checkpoints to behave.
"""

SAMPLE_RATE = 48000
LATENT_HOP = 1920                 # samples per latent frame -> 25 Hz
LATENT_RATE = SAMPLE_RATE / LATENT_HOP
LM_CODE_RATE = 5                  # LM audio codes per second (5 Hz)
CODES_PER_LATENT = 5              # 5 Hz -> 25 Hz upsample factor
AUDIO_CODEBOOK_SIZE = 64000       # <|audio_code_N|>, N in [0, 64000)
LATENT_DIM = 64
TIMBRE_FIX_FRAMES = 750           # 30 s refer-audio window (handler.py:2425)

MIN_DURATION_S = 10.0
MAX_DURATION_S = 600.0
MAX_BATCH = 8

TASK_TYPES = ("text2music", "repaint", "cover", "extract", "lego", "complete")
TURBO_TASKS = ("text2music", "repaint", "cover")

DEFAULT_DIT_INSTRUCTION = "Fill the audio semantic mask based on the given conditions:"
DEFAULT_LM_INSTRUCTION = "Generate audio semantic tokens based on the given conditions:"
DEFAULT_LM_UNDERSTAND_INSTRUCTION = (
    "Understand the given musical conditions and describe the audio semantics accordingly:"
)
DEFAULT_LM_INSPIRED_INSTRUCTION = (
    "Expand the user's input into a more detailed and specific musical description:"
)
DEFAULT_LM_REWRITE_INSTRUCTION = (
    "Format the user's input into a more detailed and specific musical description:"
)

TASK_INSTRUCTIONS = {
    "text2music": "Fill the audio semantic mask based on the given conditions:",
    "repaint": "Repaint the mask area based on the given conditions:",
    "cover": "Generate audio semantic tokens based on the given conditions:",
    "extract": "Extract the {TRACK_NAME} track from the audio:",
    "extract_default": "Extract the track from the audio:",
    "lego": "Generate the {TRACK_NAME} track based on the audio context:",
    "lego_default": "Generate the track based on the audio context:",
    "complete": "Complete the input track with {TRACK_CLASSES}:",
    "complete_default": "Complete the input track:",
}

def get_task_instruction(
    task_type: str,
    track_name=None,
    complete_track_classes=None,
) -> str:
    """Resolve the instruction line for a task (handler.py:1581-1610 semantics:
    track names are upper-cased; complete joins classes with ' | ')."""
    if task_type == "extract":
        if track_name:
            return TASK_INSTRUCTIONS["extract"].format(TRACK_NAME=str(track_name).upper())
        return TASK_INSTRUCTIONS["extract_default"]
    if task_type == "lego":
        if track_name:
            return TASK_INSTRUCTIONS["lego"].format(TRACK_NAME=str(track_name).upper())
        return TASK_INSTRUCTIONS["lego_default"]
    if task_type == "complete":
        if complete_track_classes:
            classes = " | ".join(str(t).upper() for t in complete_track_classes)
            return TASK_INSTRUCTIONS["complete"].format(TRACK_CLASSES=classes)
        return TASK_INSTRUCTIONS["complete_default"]
    return TASK_INSTRUCTIONS.get(task_type, TASK_INSTRUCTIONS["text2music"])


TRACK_NAMES = [
    "woodwinds", "brass", "fx", "synth", "strings", "percussion",
    "keyboard", "guitar", "bass", "drums", "backing_vocals", "vocals",
]

SFT_GEN_PROMPT = """# Instruction
{}

# Caption
{}

# Metas
{}<|endoftext|>
"""

DEFAULT_NEGATIVE_PROMPT = "NO USER INPUT"

# LM text-prompt limits (handler.py:2281-2310)
MAX_STYLE_TOKENS = 256
MAX_LYRIC_TOKENS = 2048
