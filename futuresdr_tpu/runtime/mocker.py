class Mocker: pass
