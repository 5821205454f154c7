from davinci_tpu.sequencer.pipeline import (
    DevStubProvers,
    InMemoryChain,
    Sequencer,
)

__all__ = ["DevStubProvers", "InMemoryChain", "Sequencer"]
