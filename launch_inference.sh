#!/bin/bash
# Shell launcher (reference: launch_inference.sh) — env-style variables -> CLI flags.

MODEL_PATH="${MODEL_PATH:-}"   # e.g. path to a downloaded paligemma-3b-pt-224 checkpoint
PROMPT="${PROMPT:-Describe the image}"
IMAGE_FILE_PATH="${IMAGE_FILE_PATH:-test_images/pic1.jpeg}"
MAX_TOKENS_TO_GENERATE="${MAX_TOKENS_TO_GENERATE:-100}"
TEMPERATURE="${TEMPERATURE:-0.8}"
TOP_P="${TOP_P:-0.9}"
DO_SAMPLE="${DO_SAMPLE:-False}"
ONLY_CPU="${ONLY_CPU:-False}"

EXTRA=""
if [ -z "$MODEL_PATH" ]; then
    EXTRA="--demo"
else
    EXTRA="--model_path=$MODEL_PATH"
fi

python inference.py \
    $EXTRA \
    --prompt="$PROMPT" \
    --image_file_path="$IMAGE_FILE_PATH" \
    --max_tokens_to_generate=$MAX_TOKENS_TO_GENERATE \
    --temperature=$TEMPERATURE \
    --top_p=$TOP_P \
    --do_sample=$DO_SAMPLE \
    --only_cpu=$ONLY_CPU
