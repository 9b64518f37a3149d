class Runtime: pass
class FlowgraphHandle: pass
