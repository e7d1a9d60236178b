"""Model components: encoders, video CNN, AV-Align fusion, decoders, seq2seq assembly."""
