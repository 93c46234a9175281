"""Round-6 name-dictionary extension: 5k → 20k+ entries.

The reference's NAMES map loads ~48k rows across six CSVs
(``/root/reference/java/alix/lucene/analysis/FrDics.java:97-170``:
forename.csv ~12.9k, commune.csv ~33.3k, plus place/author/name/
france). This module closes the volume gap with the same
public-knowledge authoring model as :mod:`fr_names2`: curated real
inventories (regional and historical French forenames, francophone
authors, historical figures, world toponyms in French orthography)
plus denser *productive* toponymic composition — the real French
commune patterns (Saint-X-sur-Y, X-en-Pays, X-lès-Bains…) instantiated
over enlarged root lists. No reference CSV content is copied.

Marker convention (shared with fr_names): trailing ``0`` = lower-
priority homograph reading; ``_`` joins multi-word names (only the
final token enters the dictionary).
"""

from __future__ import annotations

# --------------------------------------------------------------------- #
# forenames — regional (Breton, Occitan, Corsican, Basque-French),
# medieval, and 20th-century French male names
# --------------------------------------------------------------------- #

FORENAMES_M_EXT2 = """
Alban Aldo Amaury Anatole Anicet Anselme Antonin Apollinaire
Archibald Aristide Armel Arsène Aubin Aymeric Balthazar Barnabé
Basile Bastien Baudouin Bérenger Bernardin Bertin Blaise0 Boris
Brice Briac Brieuc Calixte Casimir Célestin César Charlemagne0
Chrétien Colin Côme Constant0 Constantin Corentin Cyprien Cyr
Damase Delphin Denys Désiré Dieudonné Donatien Edgar Edgard Edmé
Éloi Élie Élisée Émilien Enguerrand Éphrem Erwan Eudes Eusèbe
Évariste Ézéchiel Falco Fantin Faust Féréol Fiacre Firmin
Flavien Florentin Florimond Fortuné Foulques Fulbert Fulgence
Gaël Galahad Garin Gaspar Gatien Gaudérique Gauvain Geoffroi
Géraud Germer Gervais Ghislain Gontran Gonzague Grégory Guérin
Guilhem Guillemin Gwenaël Hardouin Hervé0 Hilaire Hildebert
Hippolyte Honorin Horace Hugo0 Humbert Innocent0 Irénée Isaac
Ismaël Jacquemin Jason Jasper Jaufré Jehan Joachim Job Jocelyn
Jonas Jourdain Jude Juste Justin Lambert Landry Laurentin Lazare
Léandre Léo Léopold Lilian Lionel Loïc Lorrain Lothaire Loup
Ludovic Macaire Malo Mamert Manuel Marceau Marcelin Marius
Martial Mathurin Maxence Maximilien Médard Melchior Méliton
Merlin Modeste Morgan Nathan Nathanaël Nestor Norbert Octave
Odilon Onésime Oscar Osmond Oswald Othon Ovide Pacôme Pantaléon
Parfait Paulin Pépin Perceval Philémon Philibert Polycarpe
Prosper Prudent Quentin Raphaël Rémy Renaud Reynald Robin
Roch Rodolphe Rodrigue Roméo Ronan Rosaire Saturnin Saül
Séraphin Servan Sévère0 Séverin Sidoine Sigismond Silvère
Siméon Sixte Stanislas Sylvère Sylvestre Tancrède Tanguy Télesphore
Teddy Thaddée Théo Théobald Théodose Théotime Thibaud
Thibert Toussaint Tudal Turold Ulysse Urbain Ursin Valère
Valentin0 Venance Vianney Victorien Virgile Vital Vivien Wandrille
Wilfried Yann Yanick Yoann Youenn Zacharie Zéphirin
""".split()

FORENAMES_F_EXT2 = """
Abeline Adélaïde Adeline Alberte Albane Alix Alizé Amandine
Ambre Ambroisine Anastasie Angeline Angélique Annick Annie
Anouk Appoline Arlette Armelle Astrid Athénaïs Aude Audrey
Augusta Aurélia Aveline Axelle Azélie Barbara Bathilde Bénédicte
Bérengère Bernadette Bertille Bibiane Capucine Carine Carmen
Cassandre Célestine Célia Chantal Christelle Claudette Claudine
Clélia Cléo Clothilde Coline Columba Cunégonde Cyrielle Daphné
Déborah Désirée Domitille Donatienne Doris Edmée Edwige Églantine
Electre Éliette Élisa Éloïse Elsa Elvire Émeline Émérentienne
Emmanuelle Éponine Ernestine Esther Eudoxie Eulalie Euphrasie
Eurydice Évangéline Evelyne Fabienne Fantine Faustine Félicie
Fleur Flora Florentine Florine Fortunée Gaëlle Garance Ghislaine
Gilberte Gillette Gina Gladys Gloria Guenièvre Gwenaëlle
Héloïse Hermance Hermine0 Honorée Hyacinthe Ida Ilda Irina Iris
Irma Isaure Iseult Isoline Jacinthe Jacotte Jeannette Jeannine
Jocelyne Josette Josiane Jovite Judicaëlle Justine0 Honorine0
Laetitia Lara Laurette Lavinia Léna Léocadie Léontine Liliane
Line0 Lison Lorraine0 Lucette Lucile Lucinde Ludivine Lydie
Mado Magali Maguelone Mahaut Mailys Manon Marceline Margot
Marianne Marinette Marjolaine Marlène Maryse Mathurine
Maud Mauricette Mélisande Mélissa Mélusine Micheline Mireille
Modestine Muriel Myriam Nadège Nadia Nine Ninon Noëlla Noémi
Octavie Olga Olympe Ombeline Ondine Oriane Ornella Pâquerette
Pascale Pascaline Paulette Pélagie Pernelle Pétronille Philippine
Philomène Pia Placidie Primerose Prisca Prudence Pulchérie
Quitterie Raphaëlle Raymonde Régine Reine0 Rolande Romane Roseline
Rosemonde Rosine Roxane Sabrina Salomé Sarah Ségolène Séraphine
Sidonie Solène Soline0 Stella Sylvaine Sylviane Tatiana Théodora
Théophanie Toinette Typhaine Urielle Ursule Véra Victorine
Violaine Virginie0 Viviane Wilhelmine Xavière Yolande Ysabeau
Zélie Zita Zoé
""".split()

# extra compound-forename generators (heads × tails in fr_names)
COMPOUND_HEADS_M2 = """
Alain0 André0 Antoine0 Bernard0 Christian0 Daniel0 Denis0 Édouard
Émile0 Georges0 Gilles0 Guy0 Hubert0 Julien0 Léon0 Lucien0 Noël0
Olivier0 Robert0 Roger0 Yves0 Xavier0
""".split()

COMPOUND_TAILS_M2 = """
Albert0 Alexandre0 Alain1 André1 Antoine1 Arnaud0 Aurèle Benjamin0
Benoît0 Bernard1 Bertrand0 Brice0 Bruno0 Christian1 Clément0 Cyril
Damien0 Denis1 Dominique0 Édouard0 Émile1 Éric0 Étienne0 Eugène1
Fabien0 Félix0 Firmin0 Francis0 Frédéric0 Gaël0 Gaspard0 Georges1
Gérard0 Gilbert0 Gilles1 Grégoire0 Guillaume0 Gustave0 Hervé1
Honoré0 Hubert1 Hugues0 Jérôme0 Joseph0 Jules0 Julien1 Laurent0
Léon1 Loïc0 Louis0 Loup0 Lucien1 Marcel0 Marie0 Marius0 Martial0
Martin0 Mathieu0 Maurice0 Maxime0 Michaël Nicolas0 Noël1 Octave0
Olivier1 Pascal0 Patrick0 Philippe0 Pierre0 Quentin0 Raoul0
Raphaël0 Raymond0 Régis Rémi0 René0 Robert1 Roch0 Rodolphe0
Roger1 Roland0 Romain0 Simon0 Stéphane0 Sylvain0 Thomas0 Victor0
Vincent0 Xavier1 Yann0 Yves1
""".split()

COMPOUND_HEADS_F2 = """
Aimée0 Andrée0 Berthe0 Blanche0 Cécile0 Charlotte0 Christiane
Colette0 Denise0 Édith0 Élisabeth0 Emma0 Gabrielle0 Geneviève0
Hélène0 Henriette0 Irène0 Jacqueline0 Julie0 Juliette0 Laure0
Lucie0 Madeleine0 Marguerite0 Marthe0 Mathilde0 Monique0 Odette0
Paule0 Renée0 Simone0 Suzanne0 Thérèse0 Yvonne0
""".split()

COMPOUND_TAILS_F2 = """
Adèle0 Agathe0 Alice0 Aline0 Amélie0 Angèle0 Annie0 Antoinette0
Aude0 Aurore0 Béatrice0 Bernadette0 Berthe1 Blanche1 Brigitte0
Capucine0 Caroline0 Catherine0 Cécile1 Céleste0 Céline0 Chantal0
Charlotte1 Christine0 Claire0 Clémence0 Colette1 Constance0
Danielle0 Denise1 Diane0 Dorothée0 Édith1 Éléonore0 Élisabeth1
Élise0 Élodie0 Émilie0 Emma1 Estelle0 Ève0 Fanny0 Flore0 Florence0
Françoise0 Gabrielle1 Geneviève1 Germaine0 Gisèle0 Hélène1
Henriette1 Hortense0 Inès0 Irène1 Isabelle0 Jacqueline1 Jeanne0
Joséphine0 Judith0 Julie1 Juliette1 Justine1 Laure1 Laurence0
Léa0 Léonie0 Louise0 Lucie1 Lucienne0 Madeleine1 Marguerite1
Marie1 Marion0 Marthe1 Mathilde1 Mélanie0 Michèle0 Monique1
Nathalie0 Nicole0 Noémie0 Odette1 Odile0 Pascale0 Paule1 Pauline0
Perrine0 Renée1 Rosalie0 Rose0 Sabine0 Simone1 Solange0 Sophie0
Suzanne1 Sylvie0 Thérèse1 Valentine0 Valérie0 Véronique0 Victoire0
Violette0 Virginie1 Yvette0 Yvonne1 Zoé0
""".split()

# --------------------------------------------------------------------- #
# authors — francophone and world-classic surnames (French canon)
# --------------------------------------------------------------------- #

AUTHORS_EXT2 = """
Abélard Achard Adamov Ajar Alain-Fournier Allais Amyot Arrabal
Artaud Aubigné Audiberti Aymé Azorín Bachelard Bainville Banville
Barbey Barbusse Barjavel Barthes Bataille0 Bazin Bédier Belleau
Benda Béranger0 Bergson Bernard0 Bernardin0 Bertaut Blanchot
Blondin Bloy Bodel Boileau Bonnefoy Bosco Bossut Boulanger0
Bourget Boylesve Brantôme Brasillach Brel Bremond Brunetière
Budé Buffon Butor Cabanis Caillois Calvin Campistron Casanova0
Cazotte Cendrars Cesbron Césaire Chamfort Champfleury Chardonne
Charron Cholières Chrestien Cingria Cioran Cladel Claudel0
Commynes Comte0 Condillac Condorcet Constant1 Coppée Courteline
Crébillon Crevel Cros Cyrano Dabit Dacier Daniel-Rops Daudet0
Deguy Delavigne Delille Desbordes-Valmore Deschamps Desportes
Desnos Destouches Dhôtel Dorgelès Drieu Du_Bartas Du_Bellay
Ducis Duhamel Dullin Dumarsais Dupanloup Dutourd Échenoz Estaunié
Fabre0 Faguet Fargue Farrère Faucher Fauriel Ferry0 Follain
Fontenelle Fort0 Fourier Fromentin Furetière Fustel Gaboriau
Garnier0 Gassendi Gautier0 Genet Geoffrin Gérard0 Gide0 Gilson
Giraud0 Glissent Gobineau Goncourt Gourmont Gozlan Green0 Grévin
Guéhenno Guilleragues Guitry Guizot Halévy Hardy0 Hélinand
Hémon Hénault Heredia Hermant Houellebecq Huet Istrati Jabès
Jaccottet Jacob0 Jammes Jarry Jaurès0 Jodelle Joinville Jouhandeau
Jouve Kessel Kristeva Labé Lacan Lacordaire Lacretelle Laforgue
Lamennais Larbaud Larguier Lautréamont Lavisse Leblanc Leconte
Leiris Lemaître Lesage Lévi-Strauss Lévinas Littré Loaisel
Machaut Maeterlinck Maine0 Maistre Malebranche Malherbe Mallet
Malot Mandiargues Marcel0 Margueritte Marot Martineau Massillon
Mauclair Maurois Maurras Mendès Merleau-Ponty Michaux0 Michelet
Mirbeau Mistral0 Monluc Monnier Montherlant Morand Moréas Mounier
Naudé Nimier Nizan Nodier Noailles Obaldia Ohnet Ollier Orléans0
Pagnol0 Palissot Paulhan Peisson Pergaud Perrault Peyrefitte
Philippe0 Pieyre Pinget Piron Pisan Ponson Pourrat Prévert
Quinault Quinet Radiguet Ramuz Régnier Renan0 Renard0 Retz0
Reverdy Ricardou Richepin Rictus Rivarol Rivière0 Robbe-Grillet
Rolland Romains Ronchaud Rotrou Roussel Rutebeuf Sagan Saint-Amant
Saint-Évremond Saint-Exupéry Saint-John_Perse0 Saint-Lambert
Saint-Pierre0 Saint-Simon Sainte-Beuve Sarraute Scarron Scève
Schlumberger Scribe Scudéry Segalen Ségur Senancour Sévigné
Siefert Simon0 Sorel Soupault Staël Suarès Sue Sully0 Supervielle
Taine Tharaud Thibaudet Thierry0 Tocqueville Toulet Triolet
Troyat Turgot Tzara Urfé Vailland Vallès Vauvenargues Verhaeren
Verne Vian Viau Vidocq Vildrac Villehardouin Villiers0 Vitrac
Voiture Volney Wace Weil Yacine Zévaco
""".split()

# --------------------------------------------------------------------- #
# historical figures — the name.csv analog: rulers, statesmen,
# soldiers, scientists, artists, composers, explorers, saints of
# history (surname or mononym as it appears in running French text)
# --------------------------------------------------------------------- #

FIGURES = """
Abbas Aboukir0 Alcibiade Alembert Ampère Annibal Antigone Antoine1
Archimède Aristote Attila Auguste0 Augereau Bayard Bazaine Beauharnais
Becquerel Béhanzin Bélisaire Bérénice Bernadotte Berthier Berthollet
Bichat Bismarck Blücher Boabdil Bonaparte Bossuet0 Boucher0 Bougainville
Boulanger1 Bourbaki Bourbon Braille Branly Broglie Brumaire0 Brutus
Bugeaud Cachin Calonne Cambacérès Cambronne Capet Carnot Cartier0
Cassini Catinat Caton Catulle César0 Chambord Champollion Chaptal
Charcot Chardin Charlemagne Chateaubriand0 Chevreul Childéric Chilpéric
Clemenceau Cléopâtre Clovis Colbert Coligny Commode Condé Constantin0
Corday Coriolan Cortés Coty Courbet Cousteau Couthon Cujas Curie
Cuvier Dagobert Danton Darius Daguerre Daumier David0 Degas Delacroix
Démosthène Denfert Desaix Descartes0 Desmoulins Diane0 Dioclétien
Diogène Dreyfus Drouot Duguesclin Dumouriez Dupleix Duquesne Eiffel
Épicure Érasme Euclide Eugénie0 Fabius Faidherbe Fallières Faraday
Faure Fermat Fersen Fesch Flamel Foch Fouché Fouquet Fourcroy
Fragonard Franklin Frédégonde Fresnel Gallieni Galilée Galles Gambetta
Garibaldi Gaulle Gengis Géricault Godefroi Gracques Grévy Guesde
Guillotin Guynemer Hannibal Haussmann Hélène1 Héloïse0 Henriette2
Héraclite Hérodote Hippocrate Hoche Horace0 Houdon Hugues1 Ingres
Isabeau Jaurès Jenner Joffre Joséphine1 Jouffroy Jugurtha Junot
Jussieu Kellermann Kléber Kutuzov Lafayette Lakanal Lamarck Lancelot
Lannes Laplace Latour Lavoisier Lebrun Leclerc Lécuyer Lépine
Lesseps Lesdiguières Loubet Louvois Lully Luther Luxembourg0
Lyautey Mac-Mahon Macdonald Magellan Maintenon Malesherbes Marat
Marceau0 Marengo0 Marius0 Marmont Masséna Mathusalem Maupeou
Maupertuis Mazarin Médicis Méliès Mirabeau Moctezuma Molay Moltke
Monge Montaigne0 Montcalm Montespan Montesquiou Montgolfier Montmorency
Moreau Mozart Murat Napoléon Necker Nelson Néron Ney Niepce
Nostradamus Orsini Pachelbel Papin Paré Pasteur Pélissier Périclès
Pétain Pétrarque Peugeot Pharamond Philippe1 Pichegru Pilâtre
Pissarro Platon Plutarque Poincaré Polignac Pompadour Pompée
Poniatowski Poussin Pythagore Rachel0 Racine0 Rameau Ravaillac
Récamier Renault Richelieu Rivoli0 Robespierre Rochambeau Rodin
Roland0 Rollon Rostopchine Rothschild Rouget Saladin Sand0
Saussure Savorgnan Schœlcher Scipion Sédillot Séguier Sieyès
Socrate Soliman Soubise Soult Spartacus Staël0 Suffren Sully
Surcouf Talleyrand Tamerlan Thémistocle Théodora0 Thiers0 Tibère
Titus Trajan Turenne Vauban Vercingétorix Vergniaud Vernet Véronèse
Vespucci Vinci Voltaire0 Washington Watteau Wellington Xerxès
""".split()

# --------------------------------------------------------------------- #
# world and French places — French orthography
# --------------------------------------------------------------------- #

PLACES_EXT2 = """
Abyssinie Açores Adriatique Albanie Alaska Altaï Anatolie Andalousie
Andorre Angola Antilles Apennins Aquitaine Aragon0 Ararat Arcadie
Arctique Ardèche Ariège Arménie Assyrie Asturies Atlas0 Attique
Australie Babylone Baléares Balkans Baltique Bangkok Barbarie
Basse-Terre Bengale Béarn Belgrade Bélize Bermudes Bessarabie
Béotie Birmanie Biscaye Bolivie Bosphore Botswana Bosnie Brabant
Brandebourg Brisbane Bucarest Bulgarie Byzance Calabre Calcutta
Californie Calvados Cambodge Cameroun Canaries Cantabrie Cantal
Capri Caraïbes Carinthie Carpates Carthage Castille Catalogne
Caucase Cévennes0 Ceylan Chaldée Charente0 Chersonèse Chicago
Chili Chypre Cilicie Colombie Colorado Congo Connecticut Cordoue
Corfou Corinthe Corrèze0 Crète Crimée Croatie Cuba Cyclades
Dalmatie Damas Dardanelles Dauphiné0 Delphes Dniepr Dordogne0
Drôme0 Dublin Èbre Édimbourg Égée Elbe Épire Équateur Erevan
Érié Estonie Éthiopie Etna Eubée Euphrate Eurasie Finistère
Floride Formose Frise0 Galice Galilée0 Galles0 Gambie Gand Gange
Gascogne0 Gênes Géorgie Gers Ghana Gibraltar Gironde Golgotha
Grenade0 Groenland Guadeloupe Guatemala Guinée Guyane Hanoï
Havane Hawaï Haïti Hébrides Hellespont Helsinki Himalaya Hongrie0
Honolulu Illinois Illyrie Indochine Indonésie Ionie Irak Iran
Irkoutsk Islande0 Istanbul Ithaque Jamaïque Java Jordanie Jura0
Jutland Kaboul Kamtchatka Kazakhstan Kenya Kiev Kilimandjaro
Kyoto Laconie Landes Laos Laponie Lettonie Levant Libye Ligurie
Lituanie Lombardie Lozère Lucanie Lucques Lutèce Luxembourg
Lydie Lyonnais Macédoine Madagascar Madère Maghreb Majorque
Malaisie Malte Mandchourie Manitoba Marais0 Marquises Martinique
Maurienne Mauritanie Mayotte Mékong Mélanésie Mercure0 Mésopotamie
Micronésie Minorque Mississippi Missouri Moldavie Monaco Mongolie
Montana Montmartre Montparnasse Moravie Morbihan Moselle0 Mozambique
Namibie Nankin Nazareth Nebraska Népal Nevada Niagara Niger
Nigeria Ninive Normandie0 Nouméa Nubie Numidie Océanie0 Ohio
Olympe0 Ombrie Ontario Oural Ouganda Padoue Palatinat Palmyre
Pampelune Panama Papouasie Paraguay Parme Parnasse Passy
Patagonie Péloponnèse Pennsylvanie Pergame Phénicie Philadelphie
Philippines Phrygie Piémont Pompéi Polynésie Poméranie Pondichéry
Pouilles Pyrénées0 Ravenne Reykjavik Rhénanie Rhodes Riviera
Rocheuses Roumanie Roussillon0 Sahara Sahel Saintonge Salonique
Samarcande Samarie Samoa Sardaigne Sarre Saskatchewan Saxe
Scandinavie Senlis0 Sibérie Sicile Silésie Singapour Slavonie
Slovaquie Slovénie Somalie Sorbonne Soudan Sparte Stockholm
Styrie Sumatra Surinam Sydney Syracuse Tahiti Taïwan Tanger
Tanzanie Tasmanie Tauride Tchad Tchécoslovaquie Tennessee Texas
Thaïlande Thèbes Thessalie Thrace Thuringe Tibet Tigre0 Tolède
Tombouctou Toscane Transylvanie Trébizonde Trieste Tripoli Troie
Tyrol Ukraine Uruguay Utah Valachie Valence0 Vatican Vaucluse
Vendée0 Vénétie Venezuela Vermont Vésuve Vietnam Vincennes
Virginie0 Vistule Volga Wagram0 Wallonie Westphalie Wisconsin
Wurtemberg Yémen Yokohama Yucatan Zambèze Zanzibar Zélande Zurich
""".split()

# --------------------------------------------------------------------- #
# toponymic composition roots — round-6 densification
# --------------------------------------------------------------------- #

SAINTS_EXT = """
Affrique Agrève Alpin Amarin Ambroix Anthème Apollinaire0 Arnoult
Astier Auban Aubert Avertin Avold Ay Aygulf Barnabé0 Bauzille
Benin Béat Béron Bonnet0 Brancher Brès Brisson Capraise Cassien
Cergue Cernin Chaffrey Chamas Chartier Chinian Christol Christophe0
Cirgues Claude0 Colomban Crépin Cricq Cybard Dalmas Désert
Dionisy Disdier Donat Élix Éman Estèphe Euphrône Eutrope Évroult
Félicien Ferréol Fort Fraimbault Front Gal Gall Gelais
Généroux Genest Gengoux Georges0 Gérand Géry Gildas0 Gilles0
Gingolph Girod Goazec Gondon Gonnery Gratien Guen Guilhem0
Haon Héand Hérent Hernin Hilarion Igneuc Illide Jacut Jean0
Jeoire Jorioz Jouan Jouin Judoce Julia Laumer Léger0 Léonard0
Léons Lézin Lormel Loube Louvent Lubin Lumier Lyphard Macaire0
Maclou Magne Maigner Maixme Mamert0 Mandé Marsal Martial0
Maudez Maximin0 Mayeux Même Menoux Méloir Mesmin Molf Nabord
Nectaire Nizier Offenge Pabu Pair Papoul Pastour Paterne0
Phal Piat Pierre1 Plaisir Pompain Préjet Privat Projet Python
Quirin Racho Régis0 Restitut Rieul Rirand Rogatien Romphaire
Ruffin Samson Sandoux Satur Sauvant Secondin Seine0 Senier
Séverin0 Sigismond0 Silvain Sorlin Soupplets Suliac Sylvain0
Thégonnec Thonan Thual Trivier Tugdual Vaize Vaury Véran Vérand
Viâtre Vigor Vincent0 Vougay Vrain Ybard Ygeaux Yzan
""".split()

SAINTES_EXT = """
Agathe0 Alauzie Aulde Austreberthe Barbe0 Bazeille Blandine
Camelle Céronne Christie Christine0 Colombe0 Consorce Dode
Engrâce Eugénie1 Fauste Flaive Fortunade Gemme Hélène2 Jalle
Julie2 Juliette2 Léocadie0 Lheurine Lizaigne Magnance Marguerite2
Marthe2 Mondane Néomaye Opportune Orse Ouenne Pallaye Pazanne
Pexine Pience Preuve Ramée Ruffine Scolasse Sève Solange0
Soulle Terre Trie Valière Vertu Vaubourg
""".split()

RIVERS_EXT = """
Adour Agout Ain Ance Ardour Argens Ariège0 Armançon Arroux Arve
Authie Auvézère Aveyron0 Bidassoa Bienne Blaise0 Borne Bourbre
Boutonne Bruche Canche Cèze Charentonne Chiers Cisse Clain Cousin
Couze Dive Dronne Drot Eaulne Epte Erdre Essonne Eyrieux Fecht
Furan Gapeau Gardon Gave Gier Giffre Hers Huisne Iton Lauch Lèze
Lignon Loing Loue Lunain Madon Mossig Mosson Ognon Orb Orge Osse
Ouche Ource Ouvèze Rance Risle Salat Sauldre Scorff Sioule Sorgue
Têt Thérain Thouet Tille Touch Trieux Vance Vègre Vère Vézère
Viaur Vidourle Vingeanne Vologne Yerres Yèvre
""".split()

PAYS_EXT = """
Albigeois Armagnac Artois0 Aunis Barrois Bazadais Beaujolais
Bigorre Blésois Bocage Boulonnais Bourbonnais Buëch Cambrésis
Charolais Chartreuse Chautagne Comminges Condomois Couserans
Dunois Emblavez Faucigny Forez Gapençais Gévaudan Grésivaudan
Hurepoix Lauragais Lavedan Livradois Lomagne Lyonnais0 Maine
Marensin Mauges Mellois Mercantour Minervois Montmorillonnais
Nivernais Oisans Orléanais Othe0 Ouche0 Perche Périgord Queyras
Razès Rouergue Ruffécois Santerre Saosnois Ségala Soissonnais
Tarentaise Ternois Toulois Trégor Tricastin Vallage Vallespir
Velay Vendômois Vermandois Vimeu Vivarais Vuache
""".split()

TOPO_BASES_EXT = """
Ablon Aigrefeuille Ancy Andelot Angé Anglure Annet Arcy Ardres
Argences Arnay Arzon Athée Aubin0 Aunay Auvers Auzon Avon Avrillé
Bagé Baigneux Bailleul Balleroy Barbentane Bassou Baugy Bazas
Beaufort Beaulieu0 Beaupréau Beauvoir Bécon Bédée Bellême Belvès
Bénévent Bernay0 Berzé Bessines Beuvron Blandy Blet Boën Boran
Bormes Bouaye Bouchain Bourmont Bozouls Brassac Brécy Brégy
Brette Brézolles Brinon Brissac Broons Bueil Bully Burie Buzet
Cadenet Cadillac Calmont Camarès Campan Cancale Candes Capdenac
Carbonne Carhaix Casteljaloux Castillon Caudebec Caunes Cauterets
Céaucé Cérences Cerisiers Chabanais Chablis Chabris Chalais
Chalamont Chalonnes Chambley Champdeniers Champeix Champlitte
Champtoceaux Chanac Chantenay Chantonnay Charliau Charolles
Chârost Chassors Châteaugiron Châteaumeillant Châteauneuf0
Châteauponsac Châtelaillon Châtelguyon Chaudes-Aigues Chauffailles
Chauvigny Chazelles Chémery Chemin0 Chenonceaux Chevagnes Chèvremont
Chinon0 Clairvaux Clamart0 Cléguérec Clefmont Clisson0 Cloyes
Cluis Colombey Combourg Combronde Commana Conches Conlie Corbigny
Corcieux Cordes Corlay Cormatin Cornus Cotignac Couhé Couiza
Courpière Courseulles Courtenay Courthézon Craon Creully Crocq
Crozon Cruseilles Cuiseaux Culoz Cunlhat Cysoing Damazan Damville
Daoulas Derval Descartes1 Desvres Dienne Dieulefit Domme Donzenac
Donzy Dormans Dornes Dourdan Doué Dourgne Dozulé Duclair Duras0
Durtal Écommoy Égletons Elven Ennezat Entrains Éperlecques Ervy
Espalion Estaing Estissac Étain Étaples Évaux Exmes Eymet
Eygurande Faverges Fayence Fayl Ferney Figanières Flavigny Fleurance
Florac Fontevrault Forcalquier Formerie Fresnes0 Frévent Fronsac
Frontignan Fumay Fumel Gacé Gaillon Gamaches Ganges Gavray Gémozac
Gençay Genlis Gex Ghisonaccia Gignac Givry Goderville Gondrecourt
Gorron Gouarec Gourin Gramat Grancey Grandvilliers Granville0
Graulhet Grignan Guémené Guerche Guichen Guillaumes Guillestre
Guipavas Guise Hallencourt Ham Harcourt Haubourdin Hautefort
Herbault Héricourt Hesdin Huelgoat Huriel Husson Illiers Isigny
Janville Jarnac Javron Joinville0 Josselin Jugon Jumilhac Juniville
Jussey Juvisy0 Labrit Lacaune Lagnieu Laguiole Laignes Lalinde
Lamastre Lanmeur Lanouaille Lapalisse Largentière Lauzerte Lauzun
Lédignan Lembeye Lencloître Lesneven Lesparre Levet Levroux Lezay
Lézignan Liancourt Liernais Liffol Lignières Ligueil Limours
Livarot Locminé Loiron Longny Lormes Loué Louhans Lourdoueix
Louvigné Lubersac Luçon Lumbres Lurcy Lusignan Luzarches Luzech
Luzy Machecoul Magnac Maîche Maillezais Malaucène Malesherbes0
Malestroit Mamers Mansle Marans Marchaux Marchenoir Marciac
Marcigny Marcoussis Marennes Marvejols Matignon Matour Maubourguet
Mauléon Maulévrier Maurs Mayet Mazamet0 Mazères Melle Mello
Ménigoute Mervans Meslay Meymac Meyrueis Mézel Mézidon Mirambeau
Miramont Mirebeau0 Mirepoix Modane0 Moëlan Moncoutant Mondoubleau
Monestier Monpazier Monségur Montaigu Montbazon Montbozon
Montcornet Montendre Montfaucon Montguyon Monthermé Montmirail
Montmoreau Montrésor Montrevel Montsalvy Morée Moret Morez
Morhange Mormant Mortain Morthemer Mouchard Mougon Moulins0
Mouthe Mouy Moÿ Mussidan Mussy Muzillac Najac Nangis Nasbinals
Naucelle Nemours Nesle Neufchâtel Neuvic Neuvy Nexon Niederbronn
Noirétable Nolay Nonancourt Nouan Nouvion Noyers Nozay Nueil
Olette Oradour Orbey Orgelet Orgères Ornans Orpierre Oucques
Ouistreham Oulchy Paray Parcé Pellegrue Perros Pervenchères
Pesmes Peyrat Peyrehorade Pierrefort Pionsat Pipriac Pithiviers0
Plabennec Plélan Pleine Plouay Plouescat Plougasnou Plouigneau
Poix Poligny Pommard Pontacq Pontaumur Pontchâteau Pontgibaud
Pontrieux Pornichet Portbail Pouancé0 Pouzauges Pradelles Prades
Prauthoy Prémery Puiseaux Putanges Quarré Quérigut Questembert
Quettehou Quillan Quingey Rabastens Randan Raucourt Réalmont
Recey Regnéville Rémalard Renwez Ribécourt Ribérac Riscle Rocamadour
Rochechouart Rochemaure Rochessauve Roisel Roquebillière Roquefort
Rosporden Rostrenen Rouillac Roujan Roybon Royère Rozoy Rue0
Ruffec Rugles Rumigny Ruoms Sablenceaux Saillans Salbris Salernes
Salies Salignac Sallanches Salviac Samatan Samer Sancergues
Sancoins Sarralbe Sartilly Sarzeau Sauxillanges Sauzé Savenay
Saverdun Scaër Seiches Seignelay Sellières Selongey Semur0
Septèmes Sérent Serres Seyches Sézanne0 Sigean Signy Sissonne
Socovet Sombernon Sommières Songeons Sorgues Souesmes Soulaines
Sourdeval Spézet Taillebourg Tallard Tanlay Taninges Tartas
Taulé Tessy Thenon Theux Thèze Thiaucourt Thiberville Thiviers
Thizy Thorens Thueyts Tinchebray Tinténiac Tombebœuf Tonneins
Torigni Toucy Touques0 Tourouvre Toury Trèbes Treignac Trévoux
Triaucourt Trun Tuchan Uzerche Valdahon Valderiès Valensole
Valgorge Valmont Vatan Vauvillers Vayrac Vélines Venarey Verfeil
Vergt Vermenton Vernoux Verteillac Vervins Veynes Vézelise Vic
Vielmur Vihiers Villaines Villandraut Villedômer Villefagnan
Villersexel Villefort Vimoutiers Violay Vitteaux Vouziers Wassy
""".split()

LE_QUALIFIERS_EXT = """
Bas Bourg0 Buisson Châtel Gaillard Guérard Hérisson0 Lac Marché0
Noble Pin0 Plessis Pont0 Port0 Puy Rotrou Thillot Val
""".split()

LES_QUALIFIERS_EXT = """
Aubiers Chapelles Deux-Églises Dames Essarts Granges Halles
Hameaux Loges Marais0 Moulins1 Ormes Pins Ponts Prés Salles
Thermes Vallées
""".split()

LA_QUALIFIERS = """
Campagne Chapelle Chaussée Croix Forêt Fontaine Garde Lande
Montagne Mothe Palud Plaine Rivière Roche Romaine Tour Ville
""".split()

SOUS_QUALIFIERS = """
Bois Jouarre Thil Vigne
""".split()

AUX_QUALIFIERS = """
Bois0 Chênes Mines0 Roses0
""".split()
