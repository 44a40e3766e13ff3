"""Checked-in public-suffix snapshot (PUBLIC DATA).

A curated snapshot of the Public Suffix List (https://publicsuffix.org/
— the Mozilla-maintained registry of suffixes under which internet users
can directly register names; the list itself is public data, MPL-2.0).
Format is the PSL's own line format so a refresh is a copy-paste:

- ``foo.bar``      exact rule: ``foo.bar`` is a public suffix;
- ``*.bar``        wildcard rule: every direct child of ``bar`` is a
                   public suffix (``anything.bar``);
- ``!foo.bar``     exception rule: overrides a wildcard — ``foo.bar``
                   is NOT a public suffix (its registrable domain is
                   ``foo.bar`` itself);
- ``// ...``       comment.

Curation policy (documented so the snapshot's blind spots are explicit,
not discovered): only rules that CHANGE the eTLD+1 outcome relative to
the PSL default rule (``*`` — the bare TLD is the suffix) are stored.
Plain one-label TLD rules (``com``, ``org``, ``uk``, …) are therefore
omitted: the default rule already yields them. Included are the
second-level registration hierarchies of the major ccTLDs a web crawl
actually hits (uk/au/nz/za/jp/kr/br/cn/in/mx/ar/tr/il/sg/hk/tw/th/id/
my/ph/vn/ua/ru/pl/ca/us), the PSL's wildcard TLDs with their
exceptions, and a PRIVATE-section subset of high-volume multi-tenant
publishing hosts (github.io, blogspot.com, …) — on a crawl these are
distinct publishers and folding them into one registrant would invert
per-domain quotas exactly the way a missing ``co.uk`` rule would.
Suffixes absent here fall back to the PSL default rule, which for
eTLD+1 equals the last-two-labels heuristic
(`functions/urls.py:url_registered_domain`).
"""

SNAPSHOT = """
// ===== ICANN section (curated) =====
// United Kingdom
ac.uk
co.uk
gov.uk
ltd.uk
me.uk
net.uk
nhs.uk
org.uk
plc.uk
police.uk
sch.uk
// Australia
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
act.au
nsw.au
nt.au
qld.au
sa.au
tas.au
vic.au
wa.au
act.edu.au
nsw.edu.au
nt.edu.au
qld.edu.au
sa.edu.au
tas.edu.au
vic.edu.au
wa.edu.au
// New Zealand
ac.nz
co.nz
cri.nz
geek.nz
gen.nz
govt.nz
health.nz
iwi.nz
kiwi.nz
maori.nz
mil.nz
net.nz
org.nz
parliament.nz
school.nz
// South Africa
ac.za
co.za
edu.za
gov.za
law.za
mil.za
net.za
nom.za
org.za
school.za
web.za
// Japan (incl. the wildcard city hierarchies with their exceptions)
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// South Korea
ac.kr
co.kr
es.kr
go.kr
hs.kr
kg.kr
mil.kr
ms.kr
ne.kr
or.kr
pe.kr
re.kr
sc.kr
seoul.kr
busan.kr
// Brazil
com.br
net.br
org.br
gov.br
edu.br
mil.br
adv.br
arq.br
art.br
bio.br
blog.br
eco.br
emp.br
eng.br
// China
ac.cn
com.cn
edu.cn
gov.cn
mil.cn
net.cn
org.cn
bj.cn
sh.cn
gd.cn
zj.cn
// India
ac.in
co.in
edu.in
firm.in
gen.in
gov.in
ind.in
mil.in
net.in
nic.in
org.in
res.in
// Mexico
com.mx
net.mx
org.mx
edu.mx
gob.mx
// Argentina
com.ar
edu.ar
gob.ar
gov.ar
int.ar
mil.ar
net.ar
org.ar
tur.ar
// Turkey
av.tr
bbs.tr
bel.tr
biz.tr
com.tr
dr.tr
edu.tr
gen.tr
gov.tr
info.tr
k12.tr
mil.tr
name.tr
net.tr
org.tr
pol.tr
tel.tr
tv.tr
web.tr
// Israel
ac.il
co.il
gov.il
idf.il
k12.il
muni.il
net.il
org.il
// Singapore
com.sg
net.sg
org.sg
gov.sg
edu.sg
per.sg
// Hong Kong
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// Taiwan
club.tw
com.tw
ebiz.tw
edu.tw
game.tw
gov.tw
idv.tw
mil.tw
net.tw
org.tw
// Thailand
ac.th
co.th
go.th
in.th
mi.th
net.th
or.th
// Indonesia
ac.id
biz.id
co.id
desa.id
go.id
mil.id
my.id
net.id
or.id
ponpes.id
sch.id
web.id
// Malaysia
com.my
net.my
org.my
gov.my
edu.my
mil.my
name.my
// Philippines
com.ph
net.ph
org.ph
gov.ph
edu.ph
ngo.ph
mil.ph
i.ph
// Vietnam
ac.vn
biz.vn
com.vn
edu.vn
gov.vn
health.vn
info.vn
int.vn
name.vn
net.vn
org.vn
pro.vn
// Ukraine
com.ua
edu.ua
gov.ua
in.ua
net.ua
org.ua
kiev.ua
kyiv.ua
kharkov.ua
lviv.ua
odessa.ua
// Russia
ac.ru
edu.ru
gov.ru
int.ru
mil.ru
test.ru
// Poland
biz.pl
com.pl
edu.pl
gov.pl
info.pl
mil.pl
net.pl
org.pl
waw.pl
wroc.pl
krakow.pl
// Canada
ab.ca
bc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
gc.ca
// United States (state hierarchies)
ak.us
al.us
ar.us
as.us
az.us
ca.us
co.us
ct.us
dc.us
de.us
fl.us
ga.us
gu.us
hi.us
ia.us
id.us
il.us
in.us
ks.us
ky.us
la.us
ma.us
md.us
me.us
mi.us
mn.us
mo.us
ms.us
mt.us
nc.us
nd.us
ne.us
nh.us
nj.us
nm.us
nv.us
ny.us
oh.us
ok.us
or.us
pa.us
pr.us
ri.us
sc.us
sd.us
tn.us
tx.us
ut.us
va.us
vi.us
vt.us
wa.us
wi.us
wv.us
wy.us
// Wildcard TLDs (whole TLD delegates second-level to registries)
*.bd
*.ck
!www.ck
*.er
*.jm
*.kh
*.mm
*.np
*.pg
// ===== PRIVATE section (curated: multi-tenant publishing hosts) =====
github.io
githubusercontent.com
gitlab.io
blogspot.com
wordpress.com
appspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
azurewebsites.net
cloudfront.net
elasticbeanstalk.com
s3.amazonaws.com
pages.dev
workers.dev
glitch.me
neocities.org
readthedocs.io
surge.sh
onrender.com
fly.dev
deno.dev
repl.co
"""
