"""Streamlit web UI — TPU analog of the reference app (reference: app.py).

Same widgets: image upload, prompt box, max-tokens input, temperature and
top-p sliders, sampling checkbox. Improvement over the reference (which
reloads the checkpoint on every click, app.py:26-28): the model is loaded
once and cached with ``st.cache_resource``.

Run: ``streamlit run app.py -- [--model_path PATH | --demo]``
(streamlit is not baked into this image; the import is gated).
"""
from __future__ import annotations

import sys

try:
    import streamlit as st
except ImportError:  # pragma: no cover
    print(
        "streamlit is not installed in this environment. "
        "Install it (pip install streamlit) or use the CLI: python inference.py",
        file=sys.stderr,
    )
    raise SystemExit(1)

from inference import load_for_cli, test_inference

MODEL_PATH = None
DEMO = "--demo" in sys.argv or MODEL_PATH is None


@st.cache_resource
def get_model():
    return load_for_cli(MODEL_PATH, demo=DEMO)


st.title("PaliGemma Analyzer (TPU)")

uploaded_file = st.file_uploader("Upload an image or slide", type=["png", "jpg", "jpeg"])

if uploaded_file:
    from PIL import Image

    image = Image.open(uploaded_file)
    st.image(image, caption="Uploaded Image")

    prompt = st.text_input("Prompt", "Describe the image")
    max_tokens = st.number_input("Max tokens to generate", value=100, step=10)
    temperature = st.slider("Temperature", 0.1, 2.0, 0.8)
    top_p = st.slider("Top-p sampling", 0.1, 1.0, 0.9)
    do_sample = st.checkbox("Use sampling", value=False)

    if st.button("Analyze"):
        with st.spinner("Running PaliGemma on TPU..."):
            params, cfg, processor = get_model()
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
                image.convert("RGB").save(f.name)
                result = test_inference(
                    params,
                    cfg,
                    processor,
                    prompt,
                    f.name,
                    int(max_tokens),
                    float(temperature),
                    float(top_p),
                    bool(do_sample),
                )
            st.subheader("PaliGemma Insight")
            st.write(result)
